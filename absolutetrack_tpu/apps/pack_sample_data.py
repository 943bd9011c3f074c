"""Pack raw recordings into the torch_data layout for the batched path.

The reference consumes pre-packed `UmeTrack_data/torch_data` (not shipped in
this mount -- .MISSING_LARGE_BLOBS). This tool produces the same layout from
raw recording labels (+ synthetic or decoded frames):

  {out}/{recording}_{hand}/testing/mono.torch.{idx,bin}     (T, V, H, W) u8
  {out}/{recording}_{hand}/testing/labels.torch.{idx,bin}   msgpack dicts

Per the torch_data convention the stored views are already pinhole-
resampled: each fisheye view is rectified to a pinhole camera of the same
size here before packing (reference torch_data ships rectified stereo
pairs; see data_transform.py:57-75 which assumes pinhole orig cameras).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import eval_lib
from ..data import write_torch_idx
from ..geometry import affine, camera as cam
from ..ops.resample import warp_perspective_crop
from ..tracker.video_data import load_labels


def rectify_views(labels, frames, pinhole_focal: float = 240.0, max_frames=None):
    """Fisheye views -> pinhole-rectified views, returning (imgs, K, w2e)."""
    v = labels.num_views
    w = int(np.asarray(labels.cameras.width)[0])
    h = int(np.asarray(labels.cameras.height)[0])

    t_total = len(labels) if max_frames is None else min(max_frames, len(labels))
    out_imgs = np.zeros((t_total, v, h, w), np.uint8)
    out_K = np.zeros((t_total, v, 3, 3), np.float32)
    out_w2e = np.zeros((t_total, v, 4, 4), np.float32)

    @jax.jit
    def rectify(images, cams_t):
        pin = cams_t._replace(
            fx=jnp.full((v,), pinhole_focal),
            fy=jnp.full((v,), pinhole_focal),
            cx=jnp.full((v,), (w - 1) / 2.0),
            cy=jnp.full((v,), (h - 1) / 2.0),
            coeffs=jnp.zeros((v, 8)),
        )
        warped = warp_perspective_crop(
            images, cams_t, jnp.arange(v), pin, (w, h), src_kind=labels.camera_kind
        )
        return warped, cam.intrinsics_matrix(pin), affine.rigid_inverse(
            pin.T_world_from_eye
        )

    for t, frame in enumerate(frames):
        if t >= t_total:
            break
        cams_t = labels.cameras_at(t)
        warped, K, w2e = rectify(jnp.asarray(frame, jnp.float32), cams_t)
        out_imgs[t] = np.clip(np.asarray(warped), 0, 255).astype(np.uint8)
        out_K[t] = np.asarray(K)
        out_w2e[t] = np.asarray(w2e)
    return out_imgs, out_K, out_w2e


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", default="/root/reference/sample_data/user05")
    ap.add_argument("--output-dir", default="tmp/torch_data")
    ap.add_argument(
        "--generic-hand-model",
        default="/root/reference/dataset/generic_hand_model.json",
    )
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--views", type=int, nargs=2, default=[1, 2])
    ap.add_argument("--max-frames", type=int, default=64)
    ap.add_argument(
        "--renderer", choices=["mesh", "blobs"], default="mesh",
        help="synthetic-frame fallback renderer when the mp4 is absent "
        "(mesh = LBS mesh silhouettes; blobs = landmark gaussians)",
    )
    args = ap.parse_args(argv)

    import json

    with open(args.generic_hand_model) as f:
        generic_dict = json.load(f)

    from .run_eval_known_skeleton import find_label_files

    for lf in find_label_files(args.input_dir, test_only=False):
        rec = os.path.splitext(os.path.basename(lf))[0]
        labels = load_labels(lf)
        frames = eval_lib.frames_for(labels, lf[:-5] + ".mp4", args.renderer)
        imgs, K, w2e = rectify_views(labels, frames, max_frames=args.max_frames)
        lm = eval_lib.gt_landmark_sequence(labels)  # (T, 2, 21, 3) mm

        vi = np.asarray(args.views)
        t_total = imgs.shape[0]
        n_win = t_total // args.window
        hand_model_dict = {
            k: np.asarray(v).tolist() if v is not None else None
            for k, v in zip(
                labels.hand_model._fields,
                [getattr(labels.hand_model, f) for f in labels.hand_model._fields],
            )
        }

        for hand in range(2):
            monos, packs = [], []
            for wdx in range(n_win):
                sl = slice(wdx * args.window, (wdx + 1) * args.window)
                conf = labels.hand_confidences[sl, hand]
                if not (conf > 0).all():
                    continue
                monos.append(imgs[sl][:, vi])
                packs.append(
                    {
                        "extrinsics": w2e[sl][:, vi].tolist(),
                        "intrinsics": K[sl][:, vi].tolist(),
                        "enclosing_points": lm[sl, hand].tolist(),
                        "hand": [float(hand)],
                        "hand_model": hand_model_dict,
                        "wrist": labels.wrist_transforms[sl, hand].tolist(),
                        "joint_angles": labels.joint_angles[sl, hand].tolist(),
                        # no solver here: the generic-skeleton "solved" pose
                        # falls back to the GT pose (reference ships both)
                        "solved_wrist_xfs": labels.wrist_transforms[sl, hand].tolist(),
                        "solved_joint_angles": labels.joint_angles[sl, hand].tolist(),
                        "generic_hand_model": generic_dict,
                        "pinch": [0.0] * args.window,
                    }
                )
            if not monos:
                continue
            folder = os.path.join(args.output_dir, f"{rec}_hand{hand}", "testing")
            os.makedirs(folder, exist_ok=True)
            write_torch_idx(os.path.join(folder, "mono.torch.idx"), monos)
            write_torch_idx(os.path.join(folder, "labels.torch.idx"), packs)
            print(f"packed {rec} hand{hand}: {len(monos)} windows of {args.window}")


if __name__ == "__main__":
    main()
