"""Unknown-skeleton eval: two-pass scale calibration then tracking.

Reference protocol (run_eval_unknown_skeleton.py:49-153):
  pass 1: first N=30 two-view frames through the scale-prediction branch
          with the GENERIC hand model driving crops; mean predicted scale
          -> scaled generic skeleton;
  pass 2: reset history and re-track the sequence known-skeleton style with
          the calibrated skeleton.

This build additionally supports a robust least-squares upgrade over the
calibration window (--calib-mode lstsq): instead of the plain mean, solve
argmin_s sum_t w_t (s - s_t)^2 with inlier reweighting (one Huber IRLS
round) -- a windowed estimator the reference's simple mean approximates.

Scope note on lstsq/gn: both refine the AGGREGATION of the network's
per-frame scale predictions (lstsq reweights outlier frames; gn jointly
fits one shared log-scale against FK targets built from the network's own
pass-1 poses). They are self-referential by construction: a systematic
scale bias in the network's predictions passes through unchanged, so
these modes reduce calibration variance, never bias. Their accuracy value
over the plain mean is unproven until real pretrained weights exist
(random-init predictions carry no signal to aggregate).
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from . import eval_lib
from .run_eval_known_skeleton import find_label_files
from ..kinematics.hand_model import scaled_hand_model
from ..tracker.video_data import load_labels

CALIB_FRAMES = 30  # reference run_eval_unknown_skeleton.py:58


def robust_scale(scales: np.ndarray, mode: str = "mean") -> float:
    """Aggregate per-frame scale predictions over the calibration window."""
    if len(scales) == 0:
        return 1.0
    if mode == "mean":
        return float(scales.mean())
    # one IRLS round with Huber weights around the median
    med = np.median(scales)
    resid = np.abs(scales - med)
    mad = np.median(resid) + 1e-6
    c = 1.345 * 1.4826 * mad
    w = np.minimum(1.0, c / np.maximum(resid, 1e-12))
    return float((w * scales).sum() / w.sum())


def gn_window_scale(generic, calib, hand_idx: int) -> float | None:
    """Windowed Gauss-Newton scale calibration (the north-star solver).

    Targets are the pass-1 network landmarks (FK of each frame's predicted
    pose on the generic skeleton scaled by that frame's predicted scale);
    the solver then jointly refines per-frame poses + ONE shared log-scale
    via Schur-complement GN (ops/gauss_newton.py) -- a principled
    replacement for averaging per-frame scale predictions.
    """
    import jax
    import jax.numpy as jnp

    from ..kinematics.skinning import skin_landmarks
    from ..ops.gauss_newton import calibrate_scale_window

    mask = calib.valid_tracking[hand_idx]
    if mask.sum() < 2:
        return None
    t = len(mask)
    # left-canonical poses: undo the right-hand world mirror
    wr = np.asarray(calib.wrist_xfs[hand_idx]).copy()
    if hand_idx == 1:
        wr[..., :, 0] *= -1
    ja = jnp.asarray(calib.joint_angles[hand_idx])
    scales = np.where(mask, calib.predicted_scales[hand_idx], 1.0)

    from ..kinematics.hand_model import scaled_hand_model

    hand_t = jax.tree.map(lambda x: jnp.broadcast_to(x, (t,) + x.shape), generic)
    hand_t = scaled_hand_model(hand_t, jnp.asarray(scales, jnp.float32))
    targets = skin_landmarks(hand_t, ja, jnp.asarray(wr, jnp.float32))

    res = calibrate_scale_window(
        generic,
        targets,
        ja,
        jnp.asarray(wr, jnp.float32),
        frame_mask=jnp.asarray(mask, jnp.float32),
        iters=6,
    )
    return float(np.exp(np.asarray(res.log_scale)))


def calibrated_scale_from(calib, generic, calib_mode: str) -> float:
    """Aggregate one recording's pass-1 scale predictions into the user
    scale (mean / Huber-lstsq / windowed-GN, see module docstring)."""
    mask = calib.valid_tracking
    if calib_mode == "gn":
        gn_scales = [
            s for s in (gn_window_scale(generic, calib, h) for h in range(2))
            if s is not None
        ]
        return float(np.mean(gn_scales)) if gn_scales else 1.0
    return robust_scale(calib.predicted_scales[mask], calib_mode)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", default="/root/reference/sample_data")
    ap.add_argument("--output-dir", default="tmp/eval_results_unknown_skeleton")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--precision", choices=["parity", "serving"], default="parity",
        help="serving = bf16 conv trunk, f32 geometry/solvers "
        "(ModelConfig.serving(); landmark drift pinned by tests)",
    )
    ap.add_argument(
        "--generic-hand-model",
        default="/root/reference/dataset/generic_hand_model.json",
    )
    ap.add_argument(
        "--calib-mode", choices=["mean", "lstsq", "gn"], default="mean",
        help="scale-aggregation mode. Measured on the round-4 rehearsal "
        "checkpoint (full protocol, 4 recordings): mean 47.68 mm / lstsq "
        "47.68 mm / gn 47.58 mm -- all within 0.2 percent, so the plain "
        "mean (the reference's estimator) is the default; lstsq/gn reduce "
        "calibration variance only when per-frame predictions are noisy",
    )
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--world-size", type=int, default=1)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--test-only", action="store_true")
    ap.add_argument("--override", action="store_true")
    ap.add_argument(
        "--tiny-arch", action="store_true",
        help="ModelConfig.tiny(): full topology at reduced width/crop size "
        "(CPU-speed drills + the trained-protocol-chain regression test)",
    )
    ap.add_argument(
        "--batch-recordings", type=int, default=1,
        help="run both passes over N sequences in lockstep per dispatch "
        "(the TPU analog of the reference's Pool(8) over this protocol, "
        "run_eval_unknown_skeleton.py:160-168)",
    )
    ap.add_argument(
        "--mesh-data", type=int, default=1,
        help="shard the lockstep recordings over a 'data' mesh of this many "
        "devices (SPMD eval; batch-recordings must divide by it)",
    )
    ap.add_argument(
        "--renderer", choices=["mesh", "blobs"], default="mesh",
        help="synthetic-frame fallback renderer when the mp4 is absent "
        "(mesh = LBS mesh silhouettes; blobs = landmark gaussians)",
    )
    args = ap.parse_args(argv)

    from ..kinematics.hand_model import load_hand_model_json

    generic = load_hand_model_json(args.generic_hand_model)

    label_files = find_label_files(args.input_dir, args.test_only)
    label_files = label_files[args.rank :: args.world_size]
    from ..models import ModelConfig

    if args.tiny_arch:
        mcfg = (
            ModelConfig.tiny(compute_dtype="bfloat16")
            if args.precision == "serving"
            else ModelConfig.tiny()
        )
    else:
        mcfg = ModelConfig.serving() if args.precision == "serving" else ModelConfig()
    model = eval_lib.build_model(args.checkpoint, cfg=mcfg)

    errors = []

    def save_result(rel, out_path, res, user_scale):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "wb") as f:
            pickle.dump(
                {
                    "tracked_keypoints": res.tracked_keypoints,
                    "gt_keypoints": res.gt_keypoints,
                    "valid_tracking": res.valid_tracking,
                    "calibrated_scale": user_scale,
                },
                f,
            )
        err = np.linalg.norm(
            (res.gt_keypoints - res.tracked_keypoints)[res.valid_tracking], axis=-1
        ).mean(-1)
        errors.append(err)
        print(f"{rel}: mean keypoint error {err.mean():.2f} mm")

    pending = []
    for lf in label_files:
        rel = os.path.relpath(lf, args.input_dir)[:-5]
        out_path = os.path.join(args.output_dir, rel + ".npy")
        if not args.override and os.path.exists(out_path):
            print(f"skip {rel} (exists)")
            continue
        pending.append((lf, rel, out_path))

    b = max(1, args.batch_recordings)
    for i in range(0, len(pending), b):
        group = pending[i : i + b]
        if len(group) == 1 or b == 1:
            for lf, rel, out_path in group:
                labels = load_labels(lf)

                # pass 1: calibrate on the first frames (stereo required)
                frames = eval_lib.frames_for(labels, lf[:-5] + ".mp4", args.renderer)
                calib = eval_lib.track_recording(
                    model, labels, frames, hand_model_mm=generic,
                    calibrate_scale=True, max_frames=CALIB_FRAMES,
                )
                user_scale = calibrated_scale_from(calib, generic, args.calib_mode)
                print(f"{rel}: calibrated scale {user_scale:.4f} "
                      f"({calib.valid_tracking.sum()} calib frames)")

                # pass 2: fresh tracker state, known-skeleton tracking
                frames = eval_lib.frames_for(labels, lf[:-5] + ".mp4", args.renderer)
                res = eval_lib.track_recording(
                    model, labels, frames,
                    hand_model_mm=scaled_hand_model(generic, user_scale),
                    min_num_crops=1, max_frames=args.max_frames,
                )
                save_result(rel, out_path, res, user_scale)
        else:
            # lockstep two-pass over the group (reference Pool analog)
            mesh = None
            if args.mesh_data > 1:
                from absolutetrack_tpu.parallel import make_mesh

                mesh = make_mesh(data=args.mesh_data, model=1)
            labels_list = [load_labels(lf) for lf, _rel, _out in group]

            # pass 1 batched: every recording calibrates on the generic
            # skeleton (scale-prediction branch, stereo-gated)
            recs = [
                (lab, eval_lib.frames_for(lab, lf[:-5] + ".mp4", args.renderer))
                for lab, (lf, _r, _o) in zip(labels_list, group)
            ]
            calibs = eval_lib.track_recordings_batched(
                model, recs, hand_models_mm=[generic] * len(group),
                calibrate_scale=True, max_frames=CALIB_FRAMES, mesh=mesh,
            )
            scales = [
                calibrated_scale_from(c, generic, args.calib_mode)
                for c in calibs
            ]
            for (lf, rel, _out), c, s in zip(group, calibs, scales):
                print(f"{rel}: calibrated scale {s:.4f} "
                      f"({c.valid_tracking.sum()} calib frames)")

            # pass 2 batched: fresh state, per-recording calibrated skeleton
            recs = [
                (lab, eval_lib.frames_for(lab, lf[:-5] + ".mp4", args.renderer))
                for lab, (lf, _r, _o) in zip(labels_list, group)
            ]
            results = eval_lib.track_recordings_batched(
                model, recs,
                hand_models_mm=[scaled_hand_model(generic, s) for s in scales],
                min_num_crops=1, max_frames=args.max_frames, mesh=mesh,
            )
            for (lf, rel, out_path), res, s in zip(group, results, scales):
                save_result(rel, out_path, res, s)

    if errors:
        print(f"Final mean error: {np.concatenate(errors).mean():.3f} mm")


if __name__ == "__main__":
    main()
