"""Transport-independent demo-pipeline ceiling (round-5 verdict item 7).

Round-4 measured the demo topology at 4.8 / 14.0 FPS -- both numbers
dominated by the ~100 ms remote-TPU tunnel RTT, so they said nothing
about the native-ring + multiprocess topology itself. This benchmark runs
the SAME topology (apps/demo/multiprocess.py: spawn capture process ->
native SPSC shared-memory ring -> in-consumer detect+track) with the
tracker CPU-JIT in process -- no tunnel anywhere -- and reports:

  * ring-only FPS: capture process + ring + pickle framing, null consumer
    (the pure transport ceiling of the topology), and
  * pipelined FPS with a real in-process tracker stage (tiny-arch CPU jit
    as the stand-in for a locally attached chip's ~1 ms step), plus
    per-stage occupancy (pop-wait vs detect vs track ms/frame).

These are the numbers that transfer to a locally-attached accelerator:
the topology's ceiling is transport-bound only above ring-only FPS.
Reference topology being measured: demo/main.py:180-216.

Run (CPU only, no TPU grant): PYTHONPATH=/root/repo python -u
    benchmarks/demo_ring_ceiling.py [--frames 300]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from absolutetrack_tpu.apps import eval_lib
    from absolutetrack_tpu.apps.demo.multiprocess import run_multiprocess_demo
    from absolutetrack_tpu.apps.demo.pipeline import LiveTracker
    from absolutetrack_tpu.models import ModelConfig
    from absolutetrack_tpu.tracker.video_data import load_labels

    # --- ring-only ceiling: null consumer, static frame ----------------
    # (static source + first-pop-to-last-pop window: excludes process
    # spawn and per-frame rng generation, leaving ring + pickle framing)
    tw = {"first": None, "last": None, "n": 0}

    def null_consumer(_idx, _mono):
        now = time.perf_counter()
        if tw["first"] is None:
            tw["first"] = now
        tw["last"] = now
        tw["n"] += 1

    run_multiprocess_demo(
        max_frames=args.frames, source_kind="synthetic_static",
        on_frame=null_consumer, throttle_s=0.0,
    )
    ring_only_fps = max(tw["n"] - 1, 1) / max(tw["last"] - tw["first"], 1e-9)

    # --- full topology with an in-process CPU-jit tracker -------------
    labels = load_labels(
        "/root/reference/sample_data/user05/recording_00.json"
    )
    cfg = ModelConfig.tiny(input_size=(32, 32))
    model = eval_lib.build_model(None, cfg=cfg)
    from absolutetrack_tpu.tracker import TrackerConfig

    live = LiveTracker(
        model, labels.hand_model, cameras=labels.cameras_at(0),
        opts=TrackerConfig(crop_size=cfg.input_size),
    )
    live.cameras = jax.tree.map(lambda x: x[1:3], labels.cameras_at(0))

    # warm the jit BEFORE capture starts: the drop-oldest ring would
    # otherwise discard nearly the whole run behind frame 0's compile
    warm_kp = np.full((2, 2, 21, 2), -1.0, np.float32)
    warm_valid = np.zeros((2, 2), bool)
    live(np.zeros((2, 480, 640), np.uint8), warm_kp, warm_valid)

    stage_ms = {"wait": [], "detect": [], "track": []}
    state = {"last_pop": None, "n": 0, "t_start": None}

    def on_frame(idx, mono):
        now = time.perf_counter()
        if state["last_pop"] is not None:
            stage_ms["wait"].append((now - state["last_pop"]) * 1e3)
        # detect stage stand-in: fixed detections at frame center (the
        # real MediaPipe SDK is absent; its cost belongs to another
        # process in the reference topology anyway)
        t_d = time.perf_counter()
        kp = np.full((2, 2, 21, 2), -1.0, np.float32)
        valid = np.zeros((2, 2), bool)
        t_t = time.perf_counter()
        live(mono[:2], kp, valid)
        t_end = time.perf_counter()
        if state["n"] >= 1:  # frame 0 pays the jit compile
            stage_ms["detect"].append((t_t - t_d) * 1e3)
            stage_ms["track"].append((t_end - t_t) * 1e3)
        else:
            state["t_start"] = t_end
        state["n"] += 1
        state["last_pop"] = time.perf_counter()

    got2 = run_multiprocess_demo(
        max_frames=args.frames, source_kind="synthetic",
        on_frame=on_frame, throttle_s=0.0,
    )
    wall = time.perf_counter() - (state["t_start"] or time.perf_counter())
    pipe_fps = max(got2 - 1, 1) / max(wall, 1e-9)

    out = {
        "ring_only_fps": round(ring_only_fps, 1),
        "pipeline_fps_cpu_jit_tracker": round(pipe_fps, 1),
        "track_ms_mean": round(float(np.mean(stage_ms["track"])), 2),
        "track_ms_p99": round(float(np.percentile(stage_ms["track"], 99)), 2),
        "pop_wait_ms_mean": round(float(np.mean(stage_ms["wait"])), 3)
        if stage_ms["wait"] else None,
        "frames": got2,
        "note": "no tunnel anywhere; tracker = tiny-arch CPU jit in-process",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
