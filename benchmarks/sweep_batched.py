"""Sweep the batched lockstep eval step over (recordings R, precision).

Finds the throughput-optimal operating point for the multi-recording eval
(the TPU analog of the reference's Pool(8) over sequences,
/root/reference/run_eval_known_skeleton.py:116-119). Each config is a
separate XLA compile; the compilation cache makes re-runs cheap.

Run: scripts/tpu_run.sh 3600 env PYTHONPATH=/root/repo:$PYTHONPATH \
       python -u benchmarks/sweep_batched.py --recordings 16 32 --dtypes f32 bf16
"""

from __future__ import annotations

import argparse
import json
import time


def run_config(r: int, dtype: str, chunk: int, iters: int) -> dict:
    import jax

    import bench
    from absolutetrack_tpu.models import ModelConfig

    cfg = ModelConfig.serving() if dtype == "bf16" else ModelConfig()
    t_build = time.perf_counter()
    run_chunk, state, ja, wr, images_seq, chunk_, rr = bench.build_batched_step(
        num_recordings=r, chunk=chunk, config=cfg
    )
    s, res = run_chunk(state, ja, wr, images_seq)
    jax.block_until_ready(res)
    compile_s = time.perf_counter() - t_build
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s, res = run_chunk(s, ja, wr, images_seq)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    fps = iters * chunk_ * rr / dt
    out = {
        "recordings": r,
        "dtype": dtype,
        "chunk": chunk_,
        "frames_per_s": round(fps, 1),
        "ms_per_frame_aggregate": round(1e3 * dt / (iters * chunk_ * rr), 4),
        "compile_or_warmup_s": round(compile_s, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--recordings", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--dtypes", nargs="+", default=["f32", "bf16"])
    ap.add_argument("--chunks", type=int, nargs="+", default=[8])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    from absolutetrack_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    results = []
    for dtype in args.dtypes:
        for r in args.recordings:
            for chunk in args.chunks:
                results.append(run_config(r, dtype, chunk, args.iters))
    best = max(results, key=lambda x: x["frames_per_s"])
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
