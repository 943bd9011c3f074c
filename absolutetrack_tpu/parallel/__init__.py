"""Multi-chip sharding: mesh construction, sharded eval/train steps.

The reference scales with multiprocessing Pools over recordings
(run_eval_known_skeleton.py:116-119) and a stripped DistributedSampler
(async_dataset.py:458-606). Here the same axes map onto a
``jax.sharding.Mesh``:

  data  : batch of tracked-hand samples / sequence windows (DP; the analog
          of the Pool-over-recordings AND the Sampler's rank sharding)
  model : per-view backbone work (the two crop views of a sample are
          independent until FTL fusion -- sharding them puts each view's
          conv stack on its own chip, with XLA inserting the all-gather at
          the channel concat; the TP analog for this architecture)

Sequence parallelism is *temporal-window sharding*: long sequences split
into windows that fold into the batch (each window starts with a cold
memory, exactly like the reference's batched unroll that sets
use_memory=False at t=0 -- run_inference_torch_data.py:50-53). Metric
reductions are psums, replacing load_eval.py's pickle-concat.
"""

from .mesh import make_mesh, shard_batch, window_shard

__all__ = ["make_mesh", "shard_batch", "window_shard"]
