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

    def test_rendered_windows_dress_rehearsal_recipe(self):
        """The trained-weights dress-rehearsal data path (training/
        rendered.py): windows built by the REAL crop/warp pipeline over
        renderer frames must (a) carry GT in the exact convention the loss
        assumes -- skin_landmarks(left-canonical gt_wrist) equals the
        world landmarks the renderer drew, for BOTH hands -- and (b) train
        under branch='both' (known + unknown regressors in one step)."""
        from absolutetrack_tpu.tracker.tracker import MM_TO_M
        from absolutetrack_tpu.tracker.video_data import load_labels
        from absolutetrack_tpu.training.rendered import (
            _gt_landmarks_mm,
            rendered_windows_from_labels,
            slice_windows,
        )
        from absolutetrack_tpu.kinematics.skinning import skin_landmarks

        labels = load_labels(
            "/root/reference/sample_data/user05/recording_00.json"
        )
        starts = [100, 140]
        batch, hand_m = rendered_windows_from_labels(labels, starts, 2, cfg=CFG)
        assert batch.images.shape == (2, 4, 2, 32, 32)
        assert batch.images.dtype == np.uint8  # RAM-lean storage
        assert not batch.use_memory[0].any()

        # chunked build == one-shot build (the full dataset uses chunks)
        b2, _ = rendered_windows_from_labels(
            labels, starts, 2, cfg=CFG, chunk_windows=1
        )
        # 1-LSB tolerance: two differently-batched XLA executables may
        # round a bilinear value on a 0.5/255 boundary differently
        np.testing.assert_allclose(
            batch.images.astype(np.int16), b2.images.astype(np.int16), atol=1
        )
        np.testing.assert_allclose(
            batch.extrinsics, b2.extrinsics, atol=1e-6
        )

        # (a) GT convention: FK of the stored left-canonical wrist over the
        # stored left hand model reproduces the world-mm landmarks
        t, b = batch.gt_joint_angles.shape[:2]
        hand_tb = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (t,) + x.shape), hand_m
        )
        lm = np.asarray(
            skin_landmarks(
                hand_tb,
                jnp.asarray(batch.gt_joint_angles),
                jnp.asarray(batch.gt_wrist),
            )
        )
        world_mm = _gt_landmarks_mm(labels)
        for wi, s in enumerate(starts):
            for dt in range(2):
                for h in range(2):
                    np.testing.assert_allclose(
                        lm[dt, wi * 2 + h],
                        world_mm[s + dt, h] * MM_TO_M,
                        atol=1e-5,
                    )

        # unknown-branch scale target: user05 vs generic, a sane ratio
        assert 0.7 < float(np.exp(batch.gt_log_scale[0])) < 1.4

        # (b) one 'both' step on a slice: finite, both branches supervised
        sub, sub_hand = slice_windows(batch, hand_m, np.array([0, 1]))
        mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
        params = init_umetrack_params(jax.random.PRNGKey(0), CFG)
        opt = make_optimizer(lr=1e-3)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        with mesh:
            step = make_train_step(mesh, CFG, opt, branch="both")
            state, metrics = step(
                state,
                jax.tree.map(jnp.asarray, sub),
                jax.tree.map(jnp.asarray, sub_hand),
            )
        assert np.isfinite(float(metrics["total"]))
        assert "landmark_l2_m" in metrics  # known branch
        assert "u_skel_scale_logmse" in metrics  # unknown branch

    def test_augmented_rendered_corpus(self, tmp_path):
        """Round-4 corpus scaling (training/rendered.py augment_labels):
        augmented replicas must stay self-consistent -- FK of the stored GT
        reproduces the renderer's world landmarks for BOTH hands -- with
        the skeleton scale drawn from [0.8, 1.2] and joint angles inside
        the model's limits; the dataset cache must rebuild when its build
        parameters change instead of silently serving stale windows."""
        from absolutetrack_tpu.tracker.tracker import MM_TO_M
        from absolutetrack_tpu.tracker.video_data import load_labels
        from absolutetrack_tpu.training.rendered import (
            _gt_landmarks_mm,
            augment_labels,
            rendered_dataset,
            rendered_windows_from_labels,
        )
        from absolutetrack_tpu.kinematics.skinning import skin_landmarks

        base = load_labels(
            "/root/reference/sample_data/user05/recording_00.json"
        )
        aug = augment_labels(
            base, seed=42, head_rot_deg=6.0, head_trans_mm=40.0
        )
        # head augmentation must keep every camera a rigid transform and
        # actually move the trajectory
        c2w = aug.camera_to_world
        rot_c = c2w[..., :3, :3]
        np.testing.assert_allclose(
            rot_c @ np.swapaxes(rot_c, -1, -2),
            np.broadcast_to(np.eye(3), rot_c.shape),
            atol=1e-4,
        )
        assert (
            np.abs(c2w[..., :3, 3] - base.camera_to_world[..., :3, 3]).max()
            > 5.0
        )

        s = float(
            np.linalg.norm(
                np.asarray(aug.hand_model.joint_rest_positions), axis=-1
            ).sum()
            / np.linalg.norm(
                np.asarray(base.hand_model.joint_rest_positions), axis=-1
            ).sum()
        )
        assert 0.8 - 1e-5 <= s <= 1.2 + 1e-5
        jl = np.asarray(base.hand_model.joint_limits)
        assert (aug.joint_angles >= jl[:, 0] - 1e-5).all()
        assert (aug.joint_angles <= jl[:, 1] + 1e-5).all()
        rot = aug.wrist_transforms[..., :3, :3]
        np.testing.assert_allclose(
            rot @ np.swapaxes(rot, -1, -2),
            np.broadcast_to(np.eye(3), rot.shape),
            atol=1e-5,
        )

        starts = [100, 140]
        batch, hand_m = rendered_windows_from_labels(
            aug, starts, 2, cfg=CFG, crop_jitter_seed=7
        )
        t, b = batch.gt_joint_angles.shape[:2]
        hand_tb = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (t,) + x.shape), hand_m
        )
        lm = np.asarray(
            skin_landmarks(
                hand_tb,
                jnp.asarray(batch.gt_joint_angles),
                jnp.asarray(batch.gt_wrist),
            )
        )
        world_mm = _gt_landmarks_mm(aug)
        for wi, st in enumerate(starts):
            for dt in range(2):
                for h in range(2):
                    np.testing.assert_allclose(
                        lm[dt, wi * 2 + h],
                        world_mm[st + dt, h] * MM_TO_M,
                        atol=1e-5,
                    )
        # the scale target moved by the augmentation factor
        base_batch, _ = rendered_windows_from_labels(base, starts[:1], 2, cfg=CFG)
        np.testing.assert_allclose(
            np.exp(batch.gt_log_scale[0] - base_batch.gt_log_scale[0]),
            s,
            rtol=1e-4,
        )

        # cache metadata: same params -> served from cache; changed params
        # -> rebuilt (here: augment 0 -> 1 doubles the corpus)
        cache = str(tmp_path / "ds.npz")
        paths = ["/root/reference/sample_data/user05/recording_00.json"]
        b0, _ = rendered_dataset(
            paths, window_t=2, stride=200, cfg=CFG,
            max_windows_per_recording=2, cache_path=cache,
        )
        b0_again, _ = rendered_dataset(
            paths, window_t=2, stride=200, cfg=CFG,
            max_windows_per_recording=2, cache_path=cache,
        )
        np.testing.assert_array_equal(b0.images, b0_again.images)
        b1, _ = rendered_dataset(
            paths, window_t=2, stride=200, cfg=CFG,
            max_windows_per_recording=2, cache_path=cache,
            augment=1, crop_jitter=True,
        )
        assert b1.hand_idx.shape[0] == 2 * b0.hand_idx.shape[0]

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
