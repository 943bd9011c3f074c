"""Round-5 consolidated TPU measurement block -- ONE device client.

Everything the round-5 verdict items need from the mesh-renderer
rehearsal checkpoint, each section wrapped so a failure doesn't lose
later sections:
  1. known-skeleton eval app (full length, batched lockstep)
  2. unknown-skeleton eval app x 3 --calib-mode settings on MESH frames
     (verdict item 5: with finite hand extent the scale head is finally
     observable, so this comparison carries discriminating power)
  3. load_eval aggregation over all outputs + calibrated-scale vs GT
     ratio report (verdict item 1 done-criterion: within ~5% of the GT
     user05/generic scale ratio)
  4. rehearsal live-loop bench (trained weights)
  5. demo-surface rehearsal (trained weights + native ring)

Run: scripts/tpu_run.sh 7200 python -u benchmarks/round5_measure.py
"""

import pickle
import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

CKPT = "tmp/checkpoints/rehearsal.msgpack.best"


def section(name):
    print(f"\n======== {name} ========", flush=True)


def guarded(name, fn):
    section(name)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"[{name}] FAILED -- continuing", flush=True)


def known_eval():
    from absolutetrack_tpu.apps import run_eval_known_skeleton

    run_eval_known_skeleton.main([
        "--output-dir", "tmp/r5_eval_known", "--checkpoint", CKPT,
        "--override", "--batch-recordings", "4",
    ])


def unknown_evals():
    from absolutetrack_tpu.apps import run_eval_unknown_skeleton

    for mode in ("mean", "lstsq", "gn"):
        section(f"unknown-skeleton --calib-mode {mode}")
        run_eval_unknown_skeleton.main([
            "--output-dir", f"tmp/r5_eval_unknown_{mode}",
            "--checkpoint", CKPT, "--override", "--calib-mode", mode,
            "--max-frames", "96",
        ])


def gt_scale_ratio():
    """GT user05-vs-generic skeleton scale under the TRAINING-TARGET
    definition (training/rendered.py:_log_scale_vs_generic: ratio of
    summed joint-rest-offset norms) = 1.0574. All sensible definitions
    agree to ~1%: joint-rest norm-ratio 1.0624, landmark-rest 1.0623,
    per-joint median 1.0556. The round-4 notes' "~1.17" was a
    measurement error; the scale head's honest GT is ~1.06."""
    import numpy as np

    from absolutetrack_tpu.kinematics.hand_model import load_hand_model_json
    from absolutetrack_tpu.tracker.video_data import load_labels

    user = load_labels(
        "/root/reference/sample_data/user05/recording_00.json"
    ).hand_model
    gen = load_hand_model_json(
        "/root/reference/dataset/generic_hand_model.json"
    )
    num = np.linalg.norm(np.asarray(user.joint_rest_positions), axis=-1).sum()
    den = np.linalg.norm(np.asarray(gen.joint_rest_positions), axis=-1).sum()
    return float(num / den)


def aggregate():
    import os

    import numpy as np

    from absolutetrack_tpu.apps import load_eval

    for tag, d in [("known", "tmp/r5_eval_known"),
                   ("unknown(mean)", "tmp/r5_eval_unknown_mean"),
                   ("unknown(lstsq)", "tmp/r5_eval_unknown_lstsq"),
                   ("unknown(gn)", "tmp/r5_eval_unknown_gn")]:
        m = load_eval.aggregate_metrics(d)
        print(tag, {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in (m or {}).items()}, flush=True)

    ratio = gt_scale_ratio()
    print(f"GT user05/generic scale ratio: {ratio:.4f}")
    for mode in ("mean", "lstsq", "gn"):
        d = f"tmp/r5_eval_unknown_{mode}"
        rows = []
        for root, _dirs, files in os.walk(d):
            for f in sorted(files):
                if f.endswith(".npy"):
                    with open(os.path.join(root, f), "rb") as fh:
                        rows.append((f, pickle.load(fh)["calibrated_scale"]))
        scales = np.asarray([s for _, s in rows])
        if len(scales) == 0:
            continue
        rel = scales / ratio - 1.0
        print(
            f"calib[{mode}] scales:",
            {f: round(float(s), 4) for f, s in rows},
            f"-> vs GT ratio: {['%+.1f%%' % (100 * r) for r in rel]}",
            flush=True,
        )


def rehearsal():
    import rehearsal_bench as rb

    sys.argv = ["rehearsal_bench.py", "--checkpoint", CKPT]
    rb.main()


def demo():
    import demo_rehearsal as dr

    sys.argv = ["demo_rehearsal.py", "--checkpoint", CKPT]
    dr.main()


if __name__ == "__main__":
    from absolutetrack_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    guarded("known-skeleton eval", known_eval)
    guarded("unknown-skeleton evals", unknown_evals)
    guarded("load_eval aggregation + scale-vs-GT", aggregate)
    guarded("rehearsal live-loop bench", rehearsal)
    guarded("demo-surface rehearsal", demo)
    section("ALL DONE")
