"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh over the available devices.

    With one host the data axis rides ICI; with multiple processes
    jax.devices() spans hosts and the outer data axis rides DCN, which is
    the right layout: the only cross-data-shard traffic is small metric
    psums, while the per-view all-gather inside a sample stays on ICI
    (model axis innermost).
    """
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        assert len(devs) % model == 0
        data = len(devs) // model
    grid = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def shard_batch(mesh: Mesh, tree, batch_axis: int = 0):
    """Place a host pytree on the mesh, sharding axis 0 over 'data'."""

    def put(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        if x.ndim > batch_axis:
            spec[batch_axis] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, tree)


def window_shard(
    arr: np.ndarray, window: int, time_axis: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """Split (B, T, ...) sequences into (B * n_win, window, ...) windows.

    Temporal-window sharding: each window is an independent batch element
    whose first frame runs with cold memory (use_memory=False), mirroring
    the reference's batched unroll semantics
    (run_inference_torch_data.py:50-53). Returns (windows, use_memory) with
    use_memory shaped (B * n_win, window): False at each window start.

    T must divide by ``window``; trim or pad upstream.
    """
    arr = np.moveaxis(arr, time_axis, 1)
    b, t = arr.shape[:2]
    assert t % window == 0, (t, window)
    n_win = t // window
    out = arr.reshape(b * n_win, window, *arr.shape[2:])
    use_memory = np.ones((b * n_win, window), bool)
    use_memory[:, 0] = False
    return out, use_memory
