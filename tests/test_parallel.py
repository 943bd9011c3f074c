"""Mesh/sharding tests on the virtual 8-device CPU mesh.

Beyond the helper tests, TestModelMeshEquivalence runs the ACTUAL model
(train + eval steps) under three mesh layouts -- (data=1, model=1),
(data=8, model=1), (data=4, model=2) -- and asserts outputs and updated
parameters agree. This is the numerical proof that the sharding layout
(views over 'model' with XLA's all-gather at FTL fusion, batch over
'data' with psum'd grads) computes the same function as a single device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.models import ModelConfig, init_umetrack_params
from absolutetrack_tpu.parallel import make_mesh, shard_batch, window_shard
from absolutetrack_tpu.parallel.distributed import allreduce_metrics, init_distributed
from absolutetrack_tpu.training.synthetic import (
    synthetic_hand_model_m,
    synthetic_sequence_batch,
)
from absolutetrack_tpu.training.train import (
    TrainState,
    batch_shardings,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


class TestMesh:
    def test_make_mesh_axes(self):
        mesh = make_mesh(data=4, model=2)
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (4, 2)

    def test_shard_batch_places_on_data_axis(self):
        mesh = make_mesh(data=4, model=2)
        batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
        dev = shard_batch(mesh, batch)
        shard_shapes = {s.data.shape for s in dev["x"].addressable_shards}
        assert shard_shapes == {(2, 3)}
        np.testing.assert_array_equal(np.asarray(dev["x"]), batch["x"])


class TestWindowShard:
    def test_windows_and_memory_mask(self):
        arr = np.arange(2 * 6 * 3).reshape(2, 6, 3)
        windows, use_mem = window_shard(arr, window=3)
        assert windows.shape == (4, 3, 3)
        np.testing.assert_array_equal(windows[0], arr[0, :3])
        np.testing.assert_array_equal(windows[1], arr[0, 3:])
        np.testing.assert_array_equal(windows[2], arr[1, :3])
        assert not use_mem[:, 0].any()
        assert use_mem[:, 1:].all()


class TestDistributed:
    def test_single_host_noop(self):
        assert init_distributed() == (0, 1)

    def test_allreduce_single_host_identity(self):
        m = {"err_sum": 3.5, "count": 7.0}
        assert allreduce_metrics(m) == m


CFG = ModelConfig(input_size=(32, 32))
LAYOUTS = [(1, 1), (8, 1), (4, 2)]


def _mesh_for(data, model):
    if data * model == 1:
        return make_mesh(data=1, model=1, devices=jax.devices()[:1])
    return make_mesh(data=data, model=model)


def _shard_seq_batch(mesh, batch):
    shardings = batch_shardings(mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(np.asarray(x), s),
        batch,
        shardings,
        is_leaf=lambda x: x is None,
    )


@pytest.fixture(scope="module")
def mesh_fixture():
    params = init_umetrack_params(jax.random.PRNGKey(0), CFG)
    batch = synthetic_sequence_batch(8, t=3, cfg=CFG)
    hand_m = synthetic_hand_model_m(8)
    return params, batch, hand_m


class TestModelMeshEquivalence:
    """The model itself under the mesh: 1-vs-N numerical equivalence."""

    def _eval_all_layouts(self, params, batch, hand_m, branch):
        results = []
        for data, model in LAYOUTS:
            mesh = _mesh_for(data, model)
            with mesh:
                step = make_eval_step(mesh, CFG, branch=branch)
                out = step(params, _shard_seq_batch(mesh, batch), hand_m)
                jax.block_until_ready(out)
            results.append(jax.tree.map(np.asarray, out))
        return results

    def test_eval_step_equivalent_across_layouts(self, mesh_fixture):
        params, batch, hand_m = mesh_fixture
        ref, *rest = self._eval_all_layouts(params, batch, hand_m, "known")
        for got, layout in zip(rest, LAYOUTS[1:]):
            np.testing.assert_allclose(
                got["err_sum_m"], ref["err_sum_m"], rtol=1e-4,
                err_msg=f"layout {layout}",
            )
            np.testing.assert_array_equal(got["err_count"], ref["err_count"])
            np.testing.assert_allclose(
                got["joint_angles"], ref["joint_angles"], atol=1e-4,
                err_msg=f"layout {layout}",
            )
            np.testing.assert_allclose(
                got["wrist_xfs"], ref["wrist_xfs"], atol=1e-4,
                err_msg=f"layout {layout}",
            )

    def test_eval_step_unknown_branch_equivalent(self, mesh_fixture):
        params, batch, hand_m = mesh_fixture
        ref, *rest = self._eval_all_layouts(params, batch, hand_m, "unknown")
        for got, layout in zip(rest, LAYOUTS[1:]):
            np.testing.assert_allclose(
                got["scales"], ref["scales"], rtol=1e-4, err_msg=f"layout {layout}"
            )
            np.testing.assert_allclose(
                got["joint_angles"], ref["joint_angles"], atol=1e-4,
                err_msg=f"layout {layout}",
            )

    def test_train_step_grads_equivalent_across_layouts(self, mesh_fixture):
        params, batch, hand_m = mesh_fixture
        optimizer = make_optimizer()
        results = []
        for data, model in LAYOUTS:
            mesh = _mesh_for(data, model)
            # the train step donates its state arg -- give each layout its
            # own copy so the shared fixture params survive
            p = jax.tree.map(jnp.array, params)
            state = TrainState(p, optimizer.init(p), jnp.zeros((), jnp.int32))
            with mesh:
                step = make_train_step(mesh, CFG, optimizer, branch="known")
                new_state, metrics = step(state, _shard_seq_batch(mesh, batch), hand_m)
                jax.block_until_ready(new_state.params)
            results.append(
                (
                    jax.tree.map(np.asarray, new_state.params),
                    float(metrics["total"]),
                )
            )
        ref_params, ref_loss = results[0]
        for (got_params, got_loss), layout in zip(results[1:], LAYOUTS[1:]):
            assert abs(got_loss - ref_loss) / max(abs(ref_loss), 1e-9) < 1e-4, layout
            for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(ref_params),
                jax.tree_util.tree_leaves_with_path(got_params),
            ):
                scale = max(np.abs(a).max(), 1e-9)
                # 1e-2: the clipped optimizer divides every grad by the
                # GLOBAL grad norm, so one reduction-order ulp in that norm
                # rescales all updates and Adam's sqrt(v) normalization
                # amplifies near-zero-grad leaves further (measured worst
                # leaf 4.3e-3 across layouts). The SHARP layout check is
                # the pre-optimizer per-leaf gradient comparison at 5e-5
                # (__graft_entry__.dryrun_multichip).
                np.testing.assert_allclose(
                    b / scale, a / scale, atol=1e-2,
                    err_msg=f"layout {layout}, leaf {jax.tree_util.keystr(ka)}",
                )


class TestShardedBatchedEval:
    def test_recordings_shard_over_data_axis(self):
        """track_recordings_batched(mesh=...) shards recordings over the
        'data' axis; results must match the unsharded run. Heads/temporal
        are damped as in tests/test_pipelined.py so the comparison is not
        swamped by random-init noise amplification."""
        import dataclasses

        from absolutetrack_tpu.apps import eval_lib
        from absolutetrack_tpu.models import (
            ModelConfig,
            UmeTrackModel,
            init_umetrack_params,
        )
        from absolutetrack_tpu.tracker import TrackerConfig
        from absolutetrack_tpu.tracker.video_data import (
            SyntheticFrameSource,
            load_labels,
        )

        cfg = ModelConfig(input_size=(32, 32))
        opts = TrackerConfig(crop_size=(32, 32))
        params = init_umetrack_params(jax.random.PRNGKey(0), cfg)
        for reg in ("regressor_k", "regressor_u"):
            params[reg]["out"] = jax.tree.map(lambda x: x * 0.02, params[reg]["out"])
        params["temporal"] = jax.tree.map(lambda x: x * 0.1, params["temporal"])
        model = UmeTrackModel(params, cfg)

        labels = load_labels("/root/reference/sample_data/user05/recording_00.json")
        lm = eval_lib.gt_landmark_sequence(labels)

        def rec(start, length):
            sl = slice(start, start + length)
            lab = dataclasses.replace(
                labels,
                camera_to_world=labels.camera_to_world[sl],
                joint_angles=labels.joint_angles[sl],
                wrist_transforms=labels.wrist_transforms[sl],
                hand_confidences=labels.hand_confidences[sl],
            )
            return lab, list(SyntheticFrameSource(lab, lm[sl]))

        recordings = [rec(o, 3) for o in (100, 140, 60, 200)]
        mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
        sharded = eval_lib.track_recordings_batched(
            model, [(lab, iter(fr)) for lab, fr in recordings],
            opts=opts, mesh=mesh, chunk_size=3,
        )
        plain = eval_lib.track_recordings_batched(
            model, [(lab, iter(fr)) for lab, fr in recordings],
            opts=opts, chunk_size=3,
        )
        for rs, rp in zip(sharded, plain):
            np.testing.assert_array_equal(rs.valid_tracking, rp.valid_tracking)
            m = rp.valid_tracking
            np.testing.assert_allclose(
                rs.tracked_keypoints[m], rp.tracked_keypoints[m],
                rtol=1e-4, atol=1e-2,
            )
