"""Weak-scaling measurement of the sharded eval step over a device mesh.

Runs the batched known-skeleton eval step at 1, 2, 4, ... devices with a
fixed per-device batch (weak scaling) and reports hand-frames/s plus
efficiency vs the 1-device rate. On this single-chip host it runs on the
virtual CPU mesh (set XLA_FLAGS=--xla_force_host_platform_device_count=8)
to validate the sharding/collective layout; on a real pod slice the same
script measures ICI scaling.

Run (CPU mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/scaling.py --per-device-batch 4
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=4)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax

    if args.cpu or jax.default_backend() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from absolutetrack_tpu.kinematics.hand_model import (
        load_hand_model_json,
        scaled_hand_model,
    )
    from absolutetrack_tpu.models import ModelConfig, init_umetrack_params
    from absolutetrack_tpu.parallel import make_mesh
    from absolutetrack_tpu.training import make_eval_step
    from absolutetrack_tpu.training.train import SequenceBatch, batch_shardings

    cfg = ModelConfig(input_size=(32, 32))
    params = init_umetrack_params(jax.random.PRNGKey(0), cfg)
    generic = scaled_hand_model(
        load_hand_model_json("/root/reference/dataset/generic_hand_model.json"), 0.001
    )

    n_total = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_total]
    rng = np.random.default_rng(0)
    results = []
    base_rate = None
    for n_dev in sizes:
        b = args.per_device_batch * n_dev
        t = args.window
        mesh = make_mesh(data=n_dev, model=1, devices=jax.devices()[:n_dev])
        hand = jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + x.shape), generic)
        use_mem = np.zeros((t, b), bool)
        use_mem[1:] = True
        batch = SequenceBatch(
            images=rng.uniform(0, 1, (t, b, 2, 32, 32)).astype(np.float32),
            intrinsics=np.broadcast_to(
                np.eye(3, dtype=np.float32) * [250, 250, 1], (t, b, 2, 3, 3)
            ).copy(),
            extrinsics=np.broadcast_to(
                np.eye(4, dtype=np.float32), (t, b, 2, 4, 4)
            ).copy(),
            use_memory=use_mem,
            sample_mask=np.ones((t, b), bool),
            hand_idx=(np.arange(b) % 2).astype(np.int32),
            skel_axes=np.asarray(hand.joint_rotation_axes),
            skel_rest=np.asarray(hand.joint_rest_positions),
            gt_joint_angles=rng.uniform(-0.3, 0.3, (t, b, 22)).astype(np.float32),
            gt_wrist=np.broadcast_to(
                np.eye(4, dtype=np.float32), (t, b, 4, 4)
            ).copy(),
            gt_log_scale=np.zeros(b, np.float32),
        )
        with mesh:
            sh = batch_shardings(mesh)
            batch_dev = jax.tree.map(
                lambda x, s: jax.device_put(np.asarray(x), s), batch, sh,
                is_leaf=lambda x: x is None,
            )
            ev = make_eval_step(mesh, cfg, branch="known")
            out = ev(params, batch_dev, hand)
            jax.block_until_ready(out["err_sum_m"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = ev(params, batch_dev, hand)
            jax.block_until_ready(out["err_sum_m"])
            dt = time.perf_counter() - t0
        rate = args.iters * b * t / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev)
        results.append(
            {"devices": n_dev, "hand_frames_per_s": round(rate, 1), "efficiency": round(eff, 3)}
        )
        print(json.dumps(results[-1]))
    summary = {"metric": "weak_scaling", "results": results}
    if jax.default_backend() == "cpu":
        import os

        summary["note"] = (
            f"virtual CPU mesh over {os.cpu_count()} physical cores: "
            "efficiency reflects host oversubscription, not ICI scaling; "
            "use this mode only to validate the sharding layout"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
