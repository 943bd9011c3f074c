"""Multi-process distributed eval: the cross-host scaling path, executed.

The reference parallelizes eval with a single-node ``Pool(8)`` over
recording sequences (run_eval_known_skeleton.py:116-119) and left a
stripped DistributedSampler seam behind (async_dataset.py:458-606,
dangling ``get_env``). This module is the TPU-native multi-HOST version of
that seam, and it actually runs:

  * each process calls ``init_distributed`` (jax.distributed.initialize
    over a gRPC coordinator — DCN in a real pod, localhost in tests);
  * the recording list shards across processes with ``ShardSampler``
    (rank, world_size) — the same sampler that sub-shards io workers;
  * each process tracks its shard (full crop/warp/network/FK eval);
  * per-process metric SUMS merge with ``allreduce_metrics`` — the
    multihost branch (process_allgather + sum), replacing the reference's
    pickle-concat aggregation (load_eval.py:66).

Every process computes identical merged metrics, so rank 0's output is
the global result. This is the module the 2-process CPU test
(tests/test_multiprocess.py) and ``__graft_entry__.dryrun_multihost``
execute end-to-end; on real multi-host TPU the same code path runs with
the coordinator pointed at host 0.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from .distributed import allreduce_metrics, init_distributed


def tiny_eval_config():
    """A small-but-complete architecture for CPU-speed distributed drills
    (full model topology — backbone/FTL/fusion/ConvRNN/regressor — at
    reduced width; compiles in seconds instead of minutes)."""
    from ..models import ModelConfig

    return ModelConfig.tiny()


def eval_shard_metrics(
    label_files: Sequence[str],
    rank: int,
    world_size: int,
    cfg=None,
    checkpoint: Optional[str] = None,
    max_frames: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """Track this process's recording shard; return local metric sums.

    Metric definition matches run_eval_known_skeleton's reporting (mean
    keypoint error over valid hand-frames) split into reduction-friendly
    sums: ``err_sum`` (sum of per-hand-frame mean landmark errors, mm),
    ``err_count`` (valid hand-frames), ``n_frames``, ``n_recordings``.
    Sums are float64 on host so the merged result is independent of how
    recordings were sharded (f32 partial-sum ordering would not be).
    """
    from ..apps import eval_lib
    from ..data.dataset import ShardSampler
    from ..models import ModelConfig
    from ..tracker import TrackerConfig
    from ..tracker.video_data import SyntheticFrameSource, load_labels

    cfg = cfg if cfg is not None else ModelConfig()
    opts = TrackerConfig(crop_size=cfg.input_size)
    model = eval_lib.build_model(checkpoint, cfg=cfg, seed=seed)

    sampler = ShardSampler(
        len(label_files), rank=rank, world_size=world_size, drop_remainder=True
    )
    err_sum = 0.0
    err_count = 0
    n_frames = 0
    n_recordings = 0
    for i in sampler:
        labels = load_labels(label_files[i])
        frames = SyntheticFrameSource(
            labels, eval_lib.gt_landmark_sequence(labels)
        )
        res = eval_lib.track_recording(
            model, labels, frames, opts=opts, max_frames=max_frames
        )
        err = np.linalg.norm(
            (res.gt_keypoints - res.tracked_keypoints), axis=-1
        ).mean(-1)  # (2, T) mean-per-landmark error
        valid = res.valid_tracking
        err_sum += float(err[valid].astype(np.float64).sum())
        err_count += int(valid.sum())
        n_frames += res.tracked_keypoints.shape[1]
        n_recordings += 1
    return {
        "err_sum": err_sum,
        "err_count": float(err_count),
        "n_frames": float(n_frames),
        "n_recordings": float(n_recordings),
    }


def run_distributed_eval(
    label_files: Sequence[str],
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cfg=None,
    checkpoint: Optional[str] = None,
    max_frames: Optional[int] = None,
) -> Dict[str, float]:
    """Initialize multi-process JAX, eval the local shard, merge globally.

    Returns the merged metrics dict (identical on every process), with
    ``mean_err_mm`` derived from the reduced sums.
    """
    rank, world = init_distributed(coordinator_address, num_processes, process_id)
    local = eval_shard_metrics(
        label_files,
        rank,
        world,
        cfg=cfg,
        checkpoint=checkpoint,
        max_frames=max_frames,
    )
    merged = allreduce_metrics(local)
    merged["mean_err_mm"] = (
        merged["err_sum"] / merged["err_count"] if merged["err_count"] else 0.0
    )
    merged["world_size"] = float(world)
    return merged


def main(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--label-files", nargs="+", required=True)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--tiny-arch", action="store_true",
                    help="CPU-speed drill config (tiny_eval_config)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual devices)")
    ap.add_argument("--cpu-devices", type=int, default=2)
    ap.add_argument("--output", default=None, help="rank-0 metrics JSON path")
    args = ap.parse_args(argv)

    if args.cpu:
        # XLA_FLAGS must be set before the CPU backend initializes; the
        # caller's env wins if it already configured it
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.cpu_devices}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    cfg = tiny_eval_config() if args.tiny_arch else None
    merged = run_distributed_eval(
        args.label_files,
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        cfg=cfg,
        checkpoint=args.checkpoint,
        max_frames=args.max_frames,
    )
    import jax

    print(f"rank {jax.process_index()}: {json.dumps(merged)}", flush=True)
    if args.output and jax.process_index() == 0:
        with open(args.output, "w") as f:
            json.dump(merged, f)
    if jax.process_count() > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
