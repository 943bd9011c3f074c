"""Multi-host initialization and cross-host metric reduction.

The reference's only multi-worker hooks are a multiprocessing Pool over
recordings and a stripped DistributedSampler seam
(async_dataset.py:601-606, dangling ``get_env``). The TPU-native
equivalents:

  * ``init_distributed``: ``jax.distributed.initialize`` from env or
    explicit args -- after this, ``jax.devices()`` spans all hosts and a
    ('data', 'model') mesh lays data across DCN and views across ICI;
  * ``process_shard``: the (rank, world_size) pair for ShardSampler;
  * ``allreduce_metrics``: psum scalars across the mesh -- the replacement
    for load_eval.py's pickle-concat aggregation when eval runs SPMD.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX; returns (process_id, num_processes).

    No-ops on single-host (no coordinator configured anywhere). Arguments
    default to the standard JAX env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) or cloud-TPU metadata.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        return 0, 1  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def process_shard() -> Tuple[int, int]:
    """(rank, world_size) for dataset sharding on this process."""
    import jax

    return jax.process_index(), jax.process_count()


def allreduce_metrics(metrics: Dict[str, float]) -> Dict[str, float]:
    """Sum per-process scalar metric dicts across all hosts.

    Each process passes its local sums (e.g. err_sum, err_count); the
    result is identical on every host. Single-host: returns the input.
    """
    import jax

    if jax.process_count() == 1:
        return dict(metrics)
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    local = np.asarray([metrics[k] for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)  # (n_proc, n_keys)
    total = np.sum(gathered, axis=0)
    return {k: float(total[i]) for i, k in enumerate(keys)}
