"""Training step tests on a tiny config + virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.kinematics.hand_model import HandModel, load_hand_model_json, scaled_hand_model
from absolutetrack_tpu.models import ModelConfig, init_umetrack_params
from absolutetrack_tpu.parallel import make_mesh
from absolutetrack_tpu.training import make_train_step, make_eval_step
from absolutetrack_tpu.training.train import (
    SequenceBatch,
    TrainState,
    batch_shardings,
    make_optimizer,
)

CFG = ModelConfig(input_size=(32, 32))
GENERIC = "/root/reference/dataset/generic_hand_model.json"


def _hand_batched(b):
    hand = load_hand_model_json(GENERIC)
    hand = scaled_hand_model(hand, 0.001)  # meters
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + x.shape), hand)


def _batch(b=4, t=2, v=2, seed=0):
    rng = np.random.default_rng(seed)
    use_mem = np.zeros((t, b), bool)
    use_mem[1:] = True
    hand = _hand_batched(b)
    return SequenceBatch(
        images=rng.uniform(0, 1, (t, b, v, 32, 32)).astype(np.float32),
        intrinsics=np.broadcast_to(
            np.eye(3, dtype=np.float32) * [250, 250, 1], (t, b, v, 3, 3)
        ).copy(),
        extrinsics=np.broadcast_to(np.eye(4, dtype=np.float32), (t, b, v, 4, 4)).copy(),
        use_memory=use_mem,
        sample_mask=np.ones((t, b), bool),
        hand_idx=(np.arange(b) % 2).astype(np.int32),
        skel_axes=np.asarray(hand.joint_rotation_axes),
        skel_rest=np.asarray(hand.joint_rest_positions),
        gt_joint_angles=rng.uniform(-0.5, 0.5, (t, b, 22)).astype(np.float32),
        gt_wrist=np.broadcast_to(np.eye(4, dtype=np.float32), (t, b, 4, 4)).copy(),
        gt_log_scale=np.zeros(b, np.float32),
    ), hand


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self):
        mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
        params = init_umetrack_params(jax.random.PRNGKey(0), CFG)
        opt = make_optimizer(lr=1e-3)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        batch, hand = _batch()
        with mesh:
            sh = batch_shardings(mesh)
            batch_dev = jax.tree.map(
                lambda x, s: jax.device_put(np.asarray(x), s), batch, sh,
                is_leaf=lambda x: x is None,
            )
            step = make_train_step(mesh, CFG, opt, branch="known")
            losses = []
            for _ in range(4):
                state, metrics = step(state, batch_dev, hand)
                losses.append(float(metrics["total"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_eval_step_psum_semantics(self):
        mesh = make_mesh(data=4, model=2)
        params = init_umetrack_params(jax.random.PRNGKey(1), CFG)
        batch, hand = _batch(b=8)
        with mesh:
            sh = batch_shardings(mesh)
            batch_dev = jax.tree.map(
                lambda x, s: jax.device_put(np.asarray(x), s), batch, sh,
                is_leaf=lambda x: x is None,
            )
            ev = make_eval_step(mesh, CFG, branch="known")
            out = ev(params, batch_dev, hand)
        assert float(out["err_count"]) == 8 * 2  # B * T samples
        assert np.isfinite(float(out["err_sum_m"]))

    def test_unknown_branch_trains(self):
        mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
        params = init_umetrack_params(jax.random.PRNGKey(2), CFG)
        opt = make_optimizer(lr=1e-3)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        batch, hand = _batch(b=2)
        with mesh:
            sh = batch_shardings(mesh)
            batch_dev = jax.tree.map(
                lambda x, s: jax.device_put(np.asarray(x), s), batch, sh,
                is_leaf=lambda x: x is None,
            )
            step = make_train_step(mesh, CFG, opt, branch="unknown")
            state, metrics = step(state, batch_dev, hand)
        assert np.isfinite(float(metrics["total"]))
        assert "skel_scale_logmse" in metrics

    def test_training_improves_heldout_mpjpe(self, tmp_path):
        """Train from random init on the synthetic-blob vision task and
        require held-out tracked MPJPE to improve materially (not just the
        loss to decrease), plus a mid-run checkpoint/resume that reproduces
        the exact loss curve.

        The reference has no training subsystem to compare against; the
        oracle is the task itself -- blob images deterministically encode
        the FK landmarks, so a learning pipeline must recover pose.
        """
        from absolutetrack_tpu.models.checkpoint import (
            load_train_state,
            save_train_state,
        )
        from absolutetrack_tpu.training.synthetic import learnable_windows

        mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
        params = init_umetrack_params(jax.random.PRNGKey(0), CFG)
        opt = make_optimizer(lr=3e-3)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        held_batch, held_hand = learnable_windows(b=8, t=2, cfg=CFG, seed=999)

        def mpjpe_mm(ev, params):
            out = ev(params, held_batch, held_hand)
            return float(out["err_sum_m"]) / float(out["err_count"]) * 1e3

        ckpt = str(tmp_path / "mid.train")
        with mesh:
            step = make_train_step(mesh, CFG, opt, branch="known")
            ev = make_eval_step(mesh, CFG, branch="known")
            e0 = mpjpe_mm(ev, state.params)
            losses = []
            for i in range(12):
                batch, hand = learnable_windows(b=8, t=2, cfg=CFG, seed=i)
                if i == 9:
                    save_train_state(ckpt, state)
                state, metrics = step(state, batch, hand)
                losses.append(float(metrics["total"]))
            e1 = mpjpe_mm(ev, state.params)

            # resume from the mid-run checkpoint: identical curve tail
            template = TrainState(
                init_umetrack_params(jax.random.PRNGKey(1), CFG),
                opt.init(params),
                jnp.zeros((), jnp.int32),
            )
            resumed = load_train_state(ckpt, template)
            assert int(resumed.step) == 9
            relosses = []
            for i in range(9, 12):
                batch, hand = learnable_windows(b=8, t=2, cfg=CFG, seed=i)
                resumed, metrics = step(resumed, batch, hand)
                relosses.append(float(metrics["total"]))
            e1_resumed = mpjpe_mm(ev, resumed.params)

        assert np.isfinite(losses).all()
        # material improvement: >=3x reduction of held-out tracked MPJPE
        assert e1 < e0 / 3.0, (e0, e1)
        np.testing.assert_allclose(relosses, losses[9:], rtol=1e-5)
        np.testing.assert_allclose(e1_resumed, e1, rtol=1e-5)

    def test_masked_samples_do_not_contribute(self):
        """Loss with half the batch masked == loss of the unmasked half."""
        from absolutetrack_tpu.training.train import loss_fn

        params = init_umetrack_params(jax.random.PRNGKey(3), CFG)
        batch, hand = _batch(b=4)
        mask = np.asarray(batch.sample_mask).copy()
        mask[:, 2:] = False
        batch_masked = batch._replace(sample_mask=mask)
        l_masked, _ = loss_fn(params, batch_masked, hand, CFG)

        half = jax.tree.map(
            lambda x: np.asarray(x)[:, :2] if np.asarray(x).ndim >= 2 and np.asarray(x).shape[1] == 4 else (
                np.asarray(x)[:2] if np.asarray(x).ndim >= 1 and np.asarray(x).shape[0] == 4 else x
            ),
            batch,
            is_leaf=lambda x: x is None or isinstance(x, (np.ndarray, jnp.ndarray)),
        )
        hand_half = jax.tree.map(lambda x: x[:2], hand)
        l_half, _ = loss_fn(params, SequenceBatch(*half), hand_half, CFG)
        np.testing.assert_allclose(float(l_masked), float(l_half), rtol=2e-4)
