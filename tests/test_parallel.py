"""Mesh/sharding helper tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from absolutetrack_tpu.parallel import make_mesh, shard_batch, window_shard
from absolutetrack_tpu.parallel.distributed import allreduce_metrics, init_distributed


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
