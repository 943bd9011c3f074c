"""Trained-weights dress rehearsal of the sequential (live-mode) tracker.

The stock bench feeds random-init weights random noise frames, so the
tracked-pose crop feedback degenerates (the round-2 notes' known failure
mode: random weights -> arbitrary poses -> unrepresentative crop
statistics). This bench runs the REAL live loop -- crops generated from
the previous frame's TRACKED pose (reference demo flow,
/root/reference/lib/tracker/tracker.py:262-313) -- on renderer frames of
the held-out recording_11 with the rehearsal checkpoint, and reports
throughput NEXT TO tracking quality, so a crop-distribution perf
surprise with realistic weights cannot hide.

Usage:
  scripts/tpu_run.sh 1800 python -u benchmarks/rehearsal_bench.py \
      [--checkpoint tmp/checkpoints/rehearsal.msgpack] [--frames 192]
      [--random-init]   # control run: same loop, random weights

Prints one JSON line: frames/s, tracked MPJPE vs GT (mm), valid-frame
fraction, and how often the pose feedback (vs GT re-seed) drove crops.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LABELS = "/root/reference/sample_data/user05/recording_11.json"
CHUNK = 16


def render_frames(labels, num_frames: int, cache: str) -> np.ndarray:
    from absolutetrack_tpu.tracker.video_data import SyntheticFrameSource
    from absolutetrack_tpu.training.rendered import _gt_landmarks_mm

    if os.path.exists(cache):
        z = np.load(cache)
        if z["frames"].shape[0] >= num_frames:
            return z["frames"][:num_frames]
    src = SyntheticFrameSource(labels, _gt_landmarks_mm(labels))
    frames = np.stack(
        [src.render_frame(t).astype(np.uint8) for t in range(num_frames)]
    )
    os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
    np.savez_compressed(cache, frames=frames)
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="tmp/checkpoints/rehearsal.msgpack")
    ap.add_argument("--frames", type=int, default=192)
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--precision", choices=["parity", "serving"], default="serving")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from absolutetrack_tpu.utils.runtime import enable_compilation_cache, on_cpu

    enable_compilation_cache()

    from absolutetrack_tpu.kinematics.skinning import landmarks_from_hand_pose
    from absolutetrack_tpu.models import ModelConfig, UmeTrackModel, init_umetrack_params
    from absolutetrack_tpu.models.checkpoint import load_any
    from absolutetrack_tpu.tracker import HandTracker, TrackerConfig
    from absolutetrack_tpu.tracker.video_data import load_labels
    from absolutetrack_tpu.training.rendered import _gt_landmarks_mm

    labels = load_labels(LABELS)
    n = min(args.frames, (len(labels) // CHUNK) * CHUNK)
    n = (n // CHUNK) * CHUNK
    cfg = ModelConfig.serving() if args.precision == "serving" else ModelConfig()

    with on_cpu():
        if args.random_init:
            params = init_umetrack_params(jax.random.PRNGKey(0), cfg)
        else:
            params = load_any(args.checkpoint, cfg)
    model = UmeTrackModel(params, cfg)
    tracker = HandTracker(model, TrackerConfig())

    frames = render_frames(labels, n, "tmp/rehearsal_frames_rec11.npz")
    gt_lm = _gt_landmarks_mm(labels)[:n]  # (N, 2, 21, 3) mm world

    angles = jnp.asarray(labels.camera_angles)
    hand = labels.hand_model
    cams0 = labels.cameras_at(0)
    cam_seq = jnp.asarray(labels.camera_to_world[:n])  # (N, V, 4, 4)
    conf_seq = jnp.asarray(labels.hand_confidences[:n])
    ja_gt = jnp.asarray(labels.joint_angles[:n])
    wr_gt = jnp.asarray(labels.wrist_transforms[:n])

    @jax.jit
    def run_chunk(state, ja0, wr0, images_seq, cam_c, conf_c, ja_gt_c, wr_gt_c):
        """CHUNK frames per dispatch; crops follow the TRACKED pose where
        the previous frame was valid, re-seeding from GT otherwise (a real
        deployment re-seeds from its 2D detector the same way)."""

        def body(carry, xs):
            s, ja_t, wr_t = carry
            images, cam_t, conf, ja_g, wr_g = xs
            cams = cams0._replace(T_world_from_eye=cam_t)
            s, res = tracker.track_frame(
                s, images, cams, angles, hand, ja_t, wr_t, conf
            )
            fed = res.hand_valid
            ja_n = jnp.where(fed[:, None], res.joint_angles, ja_g)
            wr_n = jnp.where(fed[:, None, None], res.wrist_xfs, wr_g)
            return (s, ja_n, wr_n), (res.joint_angles, res.wrist_xfs, res.hand_valid, fed)

        (state, ja1, wr1), outs = lax.scan(
            body, (state, ja0, wr0), (images_seq, cam_c, conf_c, ja_gt_c, wr_gt_c)
        )
        return state, ja1, wr1, outs

    state = tracker.init_state()
    ja_t, wr_t = ja_gt[0], wr_gt[0]
    all_ja, all_wr, all_valid, all_fed = [], [], [], []
    # warmup compile on the first chunk without committing its state
    _ = run_chunk(
        state, ja_t, wr_t, jnp.asarray(frames[:CHUNK]), cam_seq[:CHUNK],
        conf_seq[:CHUNK], ja_gt[:CHUNK], wr_gt[:CHUNK],
    )
    jax.block_until_ready(_[1])

    t0 = time.perf_counter()
    for c in range(0, n, CHUNK):
        state, ja_t, wr_t, outs = run_chunk(
            state, ja_t, wr_t,
            jnp.asarray(frames[c : c + CHUNK]), cam_seq[c : c + CHUNK],
            conf_seq[c : c + CHUNK], ja_gt[c : c + CHUNK], wr_gt[c : c + CHUNK],
        )
        all_ja.append(np.asarray(outs[0]))
        all_wr.append(np.asarray(outs[1]))
        all_valid.append(np.asarray(outs[2]))
        all_fed.append(np.asarray(outs[3]))
    dt = time.perf_counter() - t0
    fps = n / dt

    ja = np.concatenate(all_ja)  # (N, 2, 22)
    wr = np.concatenate(all_wr)  # (N, 2, 4, 4) mm world
    valid = np.concatenate(all_valid)  # (N, 2)
    fed = np.concatenate(all_fed)

    with on_cpu():
        hand_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n, 2) + x.shape), hand
        )
        hand_idx = jnp.broadcast_to(jnp.arange(2), (n, 2))
        lm = np.asarray(
            jax.jit(landmarks_from_hand_pose)(
                hand_b, jnp.asarray(ja), jnp.asarray(wr), hand_idx
            )
        )
    err = np.linalg.norm(lm - gt_lm, axis=-1).mean(-1)  # (N, 2) mm
    conf_mask = np.asarray(labels.hand_confidences[:n]) > 0.5
    m = valid & conf_mask
    print(
        json.dumps(
            {
                "metric": "rehearsal_sequential_tracked_feedback",
                "weights": "random-init" if args.random_init else args.checkpoint,
                "precision": args.precision,
                "frames": int(n),
                "frames_per_s": round(fps, 2),
                "tracked_mpjpe_mm": round(float(err[m].mean()), 2) if m.any() else None,
                "valid_frac": round(float(m.mean()), 4),
                "pose_feedback_frac": round(float(fed[conf_mask].mean()), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
