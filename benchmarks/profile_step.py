"""Capture a jax.profiler trace of the fused tracking step.

Produces an XProf/TensorBoard trace under --log-dir for per-op device-time
analysis of the per-frame pipeline (warp kernel vs convs vs SVD etc.).

Run: scripts/tpu_run.sh 590 env PYTHONPATH=/root/repo:$PYTHONPATH \
       python benchmarks/profile_step.py --log-dir tmp/trace
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", default="tmp/trace")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mode", choices=["seq", "batched"], default="seq")
    ap.add_argument("--recordings", type=int, default=16)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    args = ap.parse_args(argv)

    import jax

    from absolutetrack_tpu.utils.runtime import enable_compilation_cache
    from absolutetrack_tpu.utils.profiling import device_trace

    enable_compilation_cache()

    import bench  # repo-root bench provides the step builder

    from absolutetrack_tpu.models import ModelConfig

    cfg = ModelConfig.serving() if args.dtype == "bf16" else ModelConfig()
    if args.mode == "seq":
        run_chunk, state, ja, wr, images_seq, chunk = bench.build_tpu_step()
    else:
        run_chunk, state, ja, wr, images_seq, chunk, _r = bench.build_batched_step(
            args.recordings, config=cfg
        )
    s, res = run_chunk(state, ja, wr, images_seq)  # compile outside the trace
    jax.block_until_ready(res)

    with device_trace(args.log_dir):
        for _ in range(args.iters):
            s, res = run_chunk(s, ja, wr, images_seq)
        jax.block_until_ready(res)
    print(f"trace written to {args.log_dir}")


if __name__ == "__main__":
    main()
