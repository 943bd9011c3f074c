"""Live demo entry point.

Modes:
  * --source camera : live stereo capture (requires a stereo webcam +
    mediapipe installed)
  * --source replay : hermetic replay of a bundled recording with GT 2D
    keypoints standing in for the MediaPipe detector -- runs anywhere,
    exercising the identical 3D path (reference analog:
    demo/tests/all_in_one_on_sample.py)

Usage:
  python -m absolutetrack_tpu.apps.demo.main --source replay --max-frames 30
"""

from __future__ import annotations

import argparse

import numpy as np


def build_replay(labels_path: str, max_frames: int, renderer: str = "mesh"):
    """Frames + GT-projection detector from a bundled recording."""
    import jax
    import jax.numpy as jnp

    from ...geometry import camera as cam
    from ..eval_lib import gt_landmark_sequence
    from ...tracker.video_data import load_labels, make_frame_source
    from .detector_2d import ReplayDetector

    labels = load_labels(labels_path)
    lm = gt_landmark_sequence(labels)  # (T, 2, 21, 3)
    src = make_frame_source(labels, renderer=renderer, landmarks_world=lm)

    # the demo rig is the stereo pair = views [1, 2] of the 4-view recording
    stereo_views = (1, 2)
    t_total = min(max_frames, len(labels))
    sequence = []
    for t in range(t_total):
        cams = labels.cameras_at(t)
        win = np.asarray(
            cam.world_to_window(cams, jnp.asarray(lm[t])[:, None], labels.camera_kind)
        )  # (2 hands, V, 21, 2)
        frame_dets = []
        for v in stereo_views:
            dets = {}
            for h in range(2):
                if labels.hand_confidences[t, h] > 0:
                    dets[h] = win[h, v]
            frame_dets.append(dets)
        sequence.append(frame_dets)

    def frames():
        for t in range(t_total):
            mono = src.render_frame(t)
            rgb = np.repeat(mono[..., None], 3, axis=-1).astype(np.uint8)
            yield mono, rgb

    return labels, frames(), ReplayDetector(sequence)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", choices=["camera", "replay"], default="replay")
    ap.add_argument("--device", type=int, default=0)
    ap.add_argument(
        "--labels", default="/root/reference/sample_data/user05/recording_00.json"
    )
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--precision", choices=["parity", "serving"], default="serving",
        help="live demo defaults to the bf16 serving trunk (lowest "
        "latency); parity = f32 HIGHEST conv precision",
    )
    ap.add_argument(
        "--renderer", choices=["mesh", "blobs"], default="mesh",
        help="replay-mode synthetic renderer (mesh silhouettes / blobs)",
    )
    ap.add_argument("--max-frames", type=int, default=60)
    ap.add_argument("--no-udp", action="store_true")
    args = ap.parse_args(argv)

    from .. import eval_lib
    from .pipeline import DemoConfig, LiveTracker, StereoFrameSource, run_pipeline

    cfg = DemoConfig(send_udp=not args.no_udp)
    from ...models import ModelConfig

    mcfg = ModelConfig.serving() if args.precision == "serving" else ModelConfig()
    model = eval_lib.build_model(args.checkpoint, cfg=mcfg)

    if args.source == "replay":
        labels, frames, detector = build_replay(
            args.labels, args.max_frames, renderer=args.renderer
        )
        live = LiveTracker(
            model,
            labels.hand_model,
            cameras=labels.cameras_at(0),
            )
        # replay uses the recording's own (4-view) rig: restrict to the
        # stereo pair the demo uses
        import jax

        stereo = jax.tree.map(lambda x: x[1:3], labels.cameras_at(0))
        live.cameras = stereo

        def restrict(mono_rgb):
            for mono, rgb in mono_rgb:
                yield mono[1:3], rgb[1:3]

        frames = restrict(frames)
        cfg.num_views = 2
    else:
        from ...kinematics.hand_model import load_hand_model_json
        from .detector_2d import MediaPipeDetector

        hand = load_hand_model_json(
            "/root/reference/dataset/generic_hand_model.json"
        )
        live = LiveTracker(model, hand)
        frames = StereoFrameSource(args.device, cfg)
        detector = MediaPipeDetector(cfg.num_views)

    def on_result(i, keypoints, fps):
        hands = sorted(keypoints)
        centers = {
            h: np.round(keypoints[h].mean(0)).astype(int).tolist() for h in hands
        }
        print(f"frame {i}: hands={hands} centers={centers} fps={fps:.1f}")

    run_pipeline(
        frames, detector, live, cfg, on_result=on_result, max_frames=args.max_frames
    )


if __name__ == "__main__":
    main()
