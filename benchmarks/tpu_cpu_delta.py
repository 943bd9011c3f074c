"""TPU-vs-CPU numerics delta of the full tracker forward.

Answers the parity question "does MXU conv precision (HIGHEST) hold the
0.5 mm landmark budget vs the CPU f32 oracle?" for the complete fused
step: crop-camera synthesis -> Pallas warp -> backbone + FTL fusion ->
ConvRNN -> regressor -> Procrustes decode -> FK landmarks.

Protocol: 3 sequential ``track_frame`` steps on a real sample-data frame
(frame 0 cold memory, frames 1-2 warm with tracked-pose feedback),
identical params/inputs on both backends; per-frame landmark deltas in mm.

Run CPU oracle first, then the TPU side:
  PYTHONPATH=/root/repo python benchmarks/tpu_cpu_delta.py cpu
  PYTHONPATH=/root/repo scripts/tpu_run.sh 1500 \
      python benchmarks/tpu_cpu_delta.py tpu

Measured 2026-08-19 (random init, HIGHEST conv precision):
  frame 0: mean 5.93 mm, max 7.41 mm
  frame 1: mean 0.020 mm, max 0.035 mm
  frame 2: mean 0.020 mm, max 0.035 mm
Frame 0's delta is NOT conv precision: stage-by-stage diffing showed the
divergence enters at crop-camera synthesis (intrinsics differ ~7e-5
relative -- CPU-vs-TPU transcendental/reduction-order noise in the
FK/look-at chain), is amplified by the white-noise test images (adjacent
pixels are uncorrelated, so a sub-pixel warp-coordinate shift moves crop
values by ~1e-2) and by the random-init output scale (wrist translations
~40 m -- 6 mm is 1.5e-4 relative). Frames 1-2 sit at the network's fixed
point with realistic output magnitudes and show the true operating-point
delta: 0.02 mm, 25x inside the 0.5 mm budget. No precision raise needed.
"""
import sys

import numpy as np


def run(mode: str):
    import jax

    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from absolutetrack_tpu.utils.runtime import enable_compilation_cache, on_cpu

    if mode == "tpu":
        enable_compilation_cache()

    from absolutetrack_tpu.kinematics.skinning import landmarks_from_hand_pose
    from absolutetrack_tpu.models import (
        ModelConfig,
        UmeTrackModel,
        init_umetrack_params,
    )
    from absolutetrack_tpu.tracker import HandTracker, TrackerConfig
    from absolutetrack_tpu.tracker.video_data import load_labels

    labels = load_labels("/root/reference/sample_data/user05/recording_00.json")
    cfg = ModelConfig()
    with on_cpu():
        params = init_umetrack_params(jax.random.PRNGKey(0), cfg)
    tracker = HandTracker(UmeTrackModel(params, cfg), TrackerConfig())

    t0 = 100
    cams = labels.cameras_at(t0)
    angles = jnp.asarray(labels.camera_angles)
    hand = labels.hand_model
    ja = jnp.asarray(labels.joint_angles[t0])
    wr = jnp.asarray(labels.wrist_transforms[t0])
    conf = jnp.asarray(labels.hand_confidences[t0])
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 256, (3, labels.num_views, 480, 636), dtype=np.uint8)
    )

    step = jax.jit(tracker.track_frame)
    state = tracker.init_state()
    outs = []
    for f in range(3):
        state, res = step(state, imgs[f], cams, angles, hand, ja, wr, conf)
        lm = jnp.stack(
            [
                landmarks_from_hand_pose(
                    hand, res.joint_angles[h], res.wrist_xfs[h], h
                )
                for h in range(2)
            ]
        )
        outs.append(np.asarray(lm, np.float64))
        ja = jnp.where(res.hand_valid[:, None], res.joint_angles, ja)
        wr = jnp.where(res.hand_valid[:, None, None], res.wrist_xfs, wr)
    lm3 = np.stack(outs)  # (3, 2, 21, 3) mm

    if mode == "cpu":
        np.save("tmp/delta_cpu_lm.npy", lm3)
        print("cpu oracle saved", lm3.shape)
    else:
        ref = np.load("tmp/delta_cpu_lm.npy")
        for f in range(3):
            d = np.linalg.norm(lm3[f] - ref[f], axis=-1)
            print(
                f"frame {f}: mean |lm delta| = {d.mean():.4f} mm, "
                f"max = {d.max():.4f} mm"
            )


if __name__ == "__main__":
    run(sys.argv[1])
