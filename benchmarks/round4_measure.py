"""Round-4 consolidated TPU measurement block -- ONE device client.

Runs, in order, each wrapped so a failure doesn't lose later sections:
  1. warp kernel sweep (incl. the int8 MXU rows)
  2. known-skeleton eval app (full length, batched lockstep)
  3. unknown-skeleton eval app x 3 --calib-mode settings (the round-3
     verdict's "evidence or demote" item)
  4. load_eval aggregation over all outputs
  5. rehearsal live-loop bench (trained weights)
  6. demo-surface rehearsal (trained weights + native ring)

Run: scripts/tpu_run.sh 7200 python -u benchmarks/round4_measure.py
"""

import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

CKPT = "tmp/checkpoints/rehearsal.msgpack"


def section(name):
    print(f"\n======== {name} ========", flush=True)


def guarded(name, fn):
    section(name)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"[{name}] FAILED -- continuing", flush=True)


def warp_sweep():
    import warp_kernel_sweep as sweep

    sweep.main()


def known_eval():
    from absolutetrack_tpu.apps import run_eval_known_skeleton

    run_eval_known_skeleton.main([
        "--output-dir", "tmp/m_eval_known", "--checkpoint", CKPT,
        "--override", "--batch-recordings", "4",
    ])


def unknown_evals():
    from absolutetrack_tpu.apps import run_eval_unknown_skeleton

    for mode in ("mean", "lstsq", "gn"):
        section(f"unknown-skeleton --calib-mode {mode}")
        run_eval_unknown_skeleton.main([
            "--output-dir", f"tmp/m_eval_unknown_{mode}",
            "--checkpoint", CKPT, "--override", "--calib-mode", mode,
            "--max-frames", "96",
        ])


def aggregate():
    from absolutetrack_tpu.apps import load_eval

    for tag, d in [("known", "tmp/m_eval_known"),
                   ("unknown(mean)", "tmp/m_eval_unknown_mean"),
                   ("unknown(lstsq)", "tmp/m_eval_unknown_lstsq"),
                   ("unknown(gn)", "tmp/m_eval_unknown_gn")]:
        m = load_eval.aggregate_metrics(d)
        print(tag, {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in (m or {}).items()}, flush=True)


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
    guarded("warp kernel sweep", warp_sweep)
    guarded("known-skeleton eval", known_eval)
    guarded("unknown-skeleton evals", unknown_evals)
    guarded("load_eval aggregation", aggregate)
    guarded("rehearsal live-loop bench", rehearsal)
    guarded("demo-surface rehearsal", demo)
    section("ALL DONE")
