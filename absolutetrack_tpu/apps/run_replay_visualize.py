"""Offline 4-view replay with visualization + Unity UDP streaming.

Reference equivalent: run_eval_window_pose.py (despite its name: decode a
recording, track per frame with GT-pose crops, draw GT vs predicted
skeletons per camera, stream keypoints to Unity at 127.0.0.1:5052).

Here: track with the standard eval driver, reproject both skeletons into
every view, optionally display (cv2) or dump annotated frames, and stream
over UDP.

Usage:
  python -m absolutetrack_tpu.apps.run_replay_visualize \
      --labels /root/reference/sample_data/user05/recording_00.json \
      --max-frames 60 [--show] [--dump-dir tmp/frames] [--no-udp]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import eval_lib
from .demo.unity_udp import UnitySender
from .demo.visualizer import HAND_COLORS, UME_EDGES, draw_skeleton
from ..geometry import camera as cam
from ..tracker.video_data import load_labels


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--labels", default="/root/reference/sample_data/user05/recording_00.json"
    )
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--max-frames", type=int, default=60)
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--dump-dir", default=None)
    ap.add_argument("--no-udp", action="store_true")
    args = ap.parse_args(argv)

    labels = load_labels(args.labels)
    model = eval_lib.build_model(args.checkpoint)
    frames_src = eval_lib.frames_for(labels, args.labels[:-5] + ".mp4")

    res = eval_lib.track_recording(
        model, labels, frames_src, max_frames=args.max_frames
    )
    sender = None if args.no_udp else UnitySender()

    frames_src = eval_lib.frames_for(labels, args.labels[:-5] + ".mp4")
    for t, mono in enumerate(frames_src):
        if t >= res.tracked_keypoints.shape[1]:
            break
        cams = labels.cameras_at(t)
        views = []
        for v in range(labels.num_views):
            img = np.repeat(
                np.clip(mono[v], 0, 255).astype(np.uint8)[..., None], 3, axis=-1
            )
            for h in range(2):
                if not res.valid_tracking[h, t]:
                    continue
                for pts_world, color in (
                    (res.gt_keypoints[h, t], (255, 255, 255)),
                    (res.tracked_keypoints[h, t], HAND_COLORS[h]),
                ):
                    cam_v = jax.tree.map(lambda x: x[v], cams)
                    win = np.asarray(
                        cam.world_to_window(
                            cam_v, jnp.asarray(pts_world), labels.camera_kind
                        )
                    )
                    draw_skeleton(img, win, UME_EDGES, color)
            views.append(img)

        if sender is not None:
            kp = {
                h: res.tracked_keypoints[h, t]
                for h in range(2)
                if res.valid_tracking[h, t]
            }
            sender.send(kp)
        if args.dump_dir:
            import cv2

            os.makedirs(args.dump_dir, exist_ok=True)
            cv2.imwrite(
                os.path.join(args.dump_dir, f"frame_{t:04d}.png"),
                np.concatenate(views, axis=1),
            )
        if args.show:
            import cv2

            cv2.imshow("replay", np.concatenate(views, axis=1))
            cv2.waitKey(1)

    err = np.linalg.norm(
        (res.gt_keypoints - res.tracked_keypoints)[res.valid_tracking], axis=-1
    ).mean(-1)
    if err.size:
        print(f"mean keypoint error over replay: {err.mean():.2f} mm")
    if sender is not None:
        sender.close()


if __name__ == "__main__":
    main()
