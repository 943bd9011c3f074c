"""Batched serving throughput: many tracked-hand windows per dispatch.

The headline bench.py measures sequential per-frame latency (live-tracking
mode). This benchmark measures the batched/serving configuration
(BASELINE.json's "full-dataset batched throughput" config): B independent
temporal windows advance in lockstep through the known-skeleton branch
(crop warp + network) under one jit, reporting tracked hand-frames per
second per chip.

Run: scripts/tpu_run.sh 590 python benchmarks/throughput.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from absolutetrack_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from absolutetrack_tpu.models import (
        FrameInputs,
        ModelConfig,
        UmeTrackModel,
        init_umetrack_params,
    )
    from absolutetrack_tpu.models.umetrack import SkeletonInputs

    from absolutetrack_tpu.utils.runtime import on_cpu

    cfg = ModelConfig()
    with on_cpu():
        params = init_umetrack_params(jax.random.PRNGKey(0), cfg)
    model = UmeTrackModel(params, cfg)
    b, t = args.batch, args.window

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (t, b, 2, 96, 96)).astype(np.float32))
    skel = SkeletonInputs(jnp.zeros((1, 22, 3)), jnp.zeros((1, 22, 3)))

    def frame(img, use_mem):
        return FrameInputs(
            left_images=img,
            intrinsics=jnp.broadcast_to(
                jnp.eye(3) * jnp.asarray([250.0, 250, 1]), (b, 2, 3, 3)
            ),
            extrinsics=jnp.broadcast_to(jnp.eye(4), (b, 2, 4, 4)),
            view_mask=jnp.ones((b, 2), bool),
            hand_idx=jnp.arange(b) % 2,
            use_memory=jnp.full((b,), use_mem),
            sample_mask=jnp.ones(b, bool),
        )

    @jax.jit
    def run(images):
        state = model.init_state(b)

        def body(carry, xs):
            state = carry
            img, is_first = xs
            state, out = model.regress_pose_use_skeleton(
                state, frame(img, True)._replace(use_memory=~is_first & jnp.ones(b, bool)), skel
            )
            return state, out.joint_angles

        is_first = jnp.arange(t) == 0
        _, outs = lax.scan(body, state, (images, is_first))
        return outs

    out = run(images)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.iters * b * t / dt
    print(
        json.dumps(
            {
                "metric": "batched_hand_frames_per_s_per_chip",
                "value": round(fps, 1),
                "unit": "hand-frames/s",
                "batch": b,
                "window": t,
            }
        )
    )


if __name__ == "__main__":
    main()
