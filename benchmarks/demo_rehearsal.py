"""Live-demo surface dress rehearsal with TRAINED weights (round-4 item 8).

Drives the demo app's replay mode end-to-end -- SyntheticFrameSource
frames -> ReplayDetector 2D keypoints -> LiveTracker (track_frame_from_2d,
one jitted dispatch/frame) -> world keypoints -- from the rehearsal
checkpoint, on the HELD-OUT recording (recording_11), asserting tracked
output sanity against the GT landmark sequence and measuring pipeline FPS.
Reference analog: demo/main.py:180-216 driving ume_tracker from
media_pipe_estimator detections.

Also pumps the native SPSC ring (apps/demo/multiprocess.py) with the same
consumer to measure the multi-process topology's frame rate.

Run: scripts/tpu_run.sh 2400 python -u benchmarks/demo_rehearsal.py \
       [--checkpoint tmp/checkpoints/rehearsal.msgpack] [--frames 120]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="tmp/checkpoints/rehearsal.msgpack")
    ap.add_argument(
        "--labels", default="/root/reference/sample_data/user05/recording_11.json"
    )
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--random-init", action="store_true",
                    help="control run: random weights instead of the checkpoint")
    ap.add_argument("--skip-ring", action="store_true")
    args = ap.parse_args()

    from absolutetrack_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from absolutetrack_tpu.apps import eval_lib
    from absolutetrack_tpu.apps.demo.main import build_replay
    from absolutetrack_tpu.apps.demo.pipeline import (
        DemoConfig, LiveTracker, run_pipeline,
    )
    from absolutetrack_tpu.models import ModelConfig

    ckpt = None if args.random_init else args.checkpoint
    model = eval_lib.build_model(ckpt, cfg=ModelConfig.serving())

    labels, frames, detector = build_replay(args.labels, args.frames)
    gt_lm = eval_lib.gt_landmark_sequence(labels)  # (T, 2, 21, 3) world mm

    live = LiveTracker(model, labels.hand_model, cameras=labels.cameras_at(0))
    import jax as _jax

    live.cameras = _jax.tree.map(lambda x: x[1:3], labels.cameras_at(0))

    def restrict(mono_rgb):
        for mono, rgb in mono_rgb:
            yield mono[1:3], rgb[1:3]

    cfg = DemoConfig(send_udp=False, num_views=2)

    per_frame = []

    def on_result(i, keypoints, fps):
        errs = [
            float(np.linalg.norm(keypoints[h] - gt_lm[i, h], axis=-1).mean())
            for h in sorted(keypoints)
        ]
        per_frame.append((i, len(keypoints), np.mean(errs) if errs else np.nan,
                          fps))

    t0 = time.perf_counter()
    run_pipeline(restrict(frames), detector, live, cfg, on_result=on_result,
                 max_frames=args.frames)
    wall = time.perf_counter() - t0

    n = len(per_frame)
    n_two_hands = sum(1 for _, k, _, _ in per_frame if k == 2)
    errs = np.asarray([e for _, k, e, _ in per_frame if k > 0])
    mean_err = float(np.nanmean(errs)) if len(errs) else float("nan")
    fps = n / wall

    ring_fps = None
    if not args.skip_ring:
        try:
            from absolutetrack_tpu.apps.demo.multiprocess import (
                run_multiprocess_demo,
            )

            live.reset()
            consumed = {"n": 0, "t_first": None}

            def on_frame(idx, mono):
                # full consumer stage: detector + tracker on ring frames
                # (synthetic capture frames are noise; this measures the
                # topology's frame rate, not accuracy). The ring frames'
                # shape differs from the replay rig's, so the FIRST call
                # jit-compiles (~1 min); time from the second frame.
                kp = np.full((2, 2, 21, 2), -1.0, np.float32)
                valid = np.zeros((2, 2), bool)
                live(mono[:2], kp, valid)
                if consumed["t_first"] is None:
                    consumed["t_first"] = time.perf_counter()
                consumed["n"] += 1

            got = run_multiprocess_demo(
                max_frames=60, source_kind="synthetic", on_frame=on_frame
            )
            post_compile = max(got - 1, 1)
            ring_fps = post_compile / max(
                time.perf_counter() - (consumed["t_first"] or time.perf_counter()),
                1e-6,
            )
        except Exception as e:  # noqa: BLE001
            print(f"ring stage skipped: {e}", file=sys.stderr)

    result = {
        "metric": "demo_replay_rehearsal",
        "weights": "random-init" if args.random_init else "rehearsal-checkpoint",
        "frames": n,
        "frames_with_both_hands_pct": round(100.0 * n_two_hands / max(n, 1), 1),
        "mean_keypoint_err_mm": round(mean_err, 1),
        "pipeline_fps": round(fps, 2),
        "ring_pipeline_fps": None if ring_fps is None else round(ring_fps, 2),
    }
    print(json.dumps(result))

    if not args.random_init:
        # sanity gates for the trained checkpoint on the held-out recording
        assert n == args.frames, (n, args.frames)
        assert n_two_hands / n >= 0.95, "trained demo lost hands"
        assert mean_err < 500.0, f"trained demo err {mean_err} mm"
        print("sanity: OK")


if __name__ == "__main__":
    main()
