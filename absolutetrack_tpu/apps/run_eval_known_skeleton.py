"""Known-skeleton evaluation over recordings (reference run_eval_known_skeleton.py).

Walks a data root for `*.json` label files (with optional sibling `.mp4`),
tracks each sequence with GT-pose-driven crop cameras and the user's own
hand model, and writes per-sequence result `.npy` files consumable by
``load_eval.py``. Sequences shard across processes/hosts by (rank,
world_size); within a process, ``--batch-recordings N`` tracks N
sequences in lockstep on the chip (the TPU-native analog of the
reference's ``Pool(8).map_async``, run_eval_known_skeleton.py:116-119).

Usage:
  python -m absolutetrack_tpu.apps.run_eval_known_skeleton \
      --input-dir /path/to/raw_data/real --output-dir tmp/eval_known \
      [--checkpoint pretrained_weights.torch] [--rank 0 --world-size 1]
"""

from __future__ import annotations

import argparse
import fnmatch
import os
import pickle

import numpy as np

from . import eval_lib
from ..tracker.video_data import load_labels


def find_label_files(input_dir: str, test_only: bool = True):
    out = []
    for cur, _dirs, files in sorted(os.walk(input_dir)):
        if test_only and "testing" not in cur:
            continue
        for f in sorted(fnmatch.filter(files, "*.json")):
            if f.startswith("."):  # AppleDouble/hidden junk (._foo.json)
                continue
            out.append(os.path.join(cur, f))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", default="/root/reference/sample_data")
    ap.add_argument("--output-dir", default="tmp/eval_results_known_skeleton")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--precision", choices=["parity", "serving"], default="parity",
        help="serving = bf16 conv trunk, f32 geometry/solvers "
        "(ModelConfig.serving(); landmark drift pinned by tests)",
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
        help="track N sequences in lockstep per dispatch (fills the chip)",
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

    label_files = find_label_files(args.input_dir, args.test_only)
    label_files = label_files[args.rank :: args.world_size]
    print(f"[rank {args.rank}] {len(label_files)} sequences")

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

    def save_result(lf, rel, out_path, res):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "wb") as f:
            pickle.dump(
                {
                    "tracked_keypoints": res.tracked_keypoints,
                    "gt_keypoints": res.gt_keypoints,
                    "valid_tracking": res.valid_tracking,
                },
                f,
            )
        err = np.linalg.norm(
            (res.gt_keypoints - res.tracked_keypoints)[res.valid_tracking], axis=-1
        ).mean(-1)
        errors.append(err)
        print(f"{rel}: mean keypoint error {err.mean():.2f} mm "
              f"({res.valid_tracking.sum()} tracked)")

    pending = []  # (label_file, rel, out_path)
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
                frames = eval_lib.frames_for(labels, lf[:-5] + ".mp4", args.renderer)
                res = eval_lib.track_recording(
                    model, labels, frames, min_num_crops=1,
                    max_frames=args.max_frames,
                )
                save_result(lf, rel, out_path, res)
        else:
            recs = []
            for lf, _rel, _out in group:
                labels = load_labels(lf)
                recs.append((labels, eval_lib.frames_for(labels, lf[:-5] + ".mp4", args.renderer)))
            mesh = None
            if args.mesh_data > 1:
                from absolutetrack_tpu.parallel import make_mesh

                mesh = make_mesh(data=args.mesh_data, model=1)
            results = eval_lib.track_recordings_batched(
                model, recs, min_num_crops=1, max_frames=args.max_frames,
                mesh=mesh,
            )
            for (lf, rel, out_path), res in zip(group, results):
                save_result(lf, rel, out_path, res)

    if errors:
        print(f"Final mean error: {np.concatenate(errors).mean():.3f} mm")


if __name__ == "__main__":
    main()
