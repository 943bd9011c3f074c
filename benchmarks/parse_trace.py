"""Aggregate device op time from a jax.profiler Chrome trace.

Reads the newest ``*.trace.json.gz`` under ``<log_dir>/plugins/profile/``,
sums device-lane event durations grouped by op name, and prints the top-N
plus the total. Divide by --iters for per-step time.

Run: python benchmarks/parse_trace.py --log-dir tmp/trace --iters 5
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(log_dir: str) -> str:
    pats = sorted(
        glob.glob(os.path.join(log_dir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not pats:
        raise SystemExit(f"no trace under {log_dir}")
    return pats[-1]


def load_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


GROUP_RULES = [
    (re.compile(r"^(fusion|loop_fusion|input_fusion|output_fusion)"), "fusion"),
    (re.compile(r"^custom-call"), "custom-call"),
    (re.compile(r"^(conv|%conv)"), "conv"),
    (re.compile(r"^(dot|%dot)"), "dot"),
    (re.compile(r"^copy"), "copy"),
    (re.compile(r"^dynamic"), "dynamic-slice/update"),
]


def _device_op_events(events):
    """(device-lane op events sorted by start, module events) from a trace."""
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    tid_names = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    ops, mods = [], []
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in dev:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), "")
        if lane == "XLA Ops":
            ops.append(e)
        elif lane == "XLA Modules":
            mods.append(e)
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))
    return ops, mods


def _self_times(ops):
    """Leaf-attributed self-time per op: nested events (cond branches,
    while bodies) get their children's time subtracted, so totals add up
    to module device occupancy without double counting.
    Returns (self_time_us Counter, counts Counter, meta dict)."""
    stack = []
    self_time = collections.Counter()
    counts = collections.Counter()
    meta = {}
    for e in ops:
        ts, dur, name = e["ts"], e["dur"], e["name"]
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        if stack:
            self_time[stack[-1][2]] -= dur
        self_time[name] += dur
        counts[name] += 1
        meta.setdefault(name, e.get("args", {}))
        stack.append((ts, dur, name))
    return self_time, counts, meta


def self_time_summary(log_dir: str, iters: int = 1):
    """Importable summary for bench.py: leaf-attributed device time from
    the newest trace under ``log_dir``.

    Returns a dict with ``total_ms`` (per iter), ``module_ms`` (device
    occupancy per iter from the XLA Modules lane), and ``ops``: a list of
    (op_name, ms_per_iter, long_name) sorted descending.
    """
    path = find_trace(log_dir)
    events = load_events(path)
    ops, mods = _device_op_events(events)
    self_time, _counts, meta = _self_times(ops)
    total_ms = sum(self_time.values()) / 1e3 / iters
    module_ms = sum(m["dur"] for m in mods) / 1e3 / iters
    rows = [
        (
            name,
            t / 1e3 / iters,
            " | ".join(
                str(meta[name].get(k, ""))
                for k in ("long_name", "tf_op", "source")
            ),
        )
        for name, t in self_time.most_common()
    ]
    return {"total_ms": total_ms, "module_ms": module_ms, "ops": rows,
            "trace": path}


def self_time_report(events, path, args):
    """Printed leaf-attributed per-op report (see _self_times)."""
    ops, mods = _device_op_events(events)
    self_time, counts, meta = _self_times(ops)
    total = sum(self_time.values()) / 1e3
    print(f"trace: {path}")
    if mods:
        durs = [round(m["dur"] / 1e3, 3) for m in mods]
        print(f"module dispatches: {len(mods)}, durations (ms): {durs[:10]}")
    print(
        f"leaf-attributed device time: {total:.3f} ms over {args.iters} iters"
        f" -> {total / args.iters:.3f} ms/iter"
    )
    print(f"{'op':36s} {'ms/iter':>9s} {'count':>6s} {'%':>6s}  hlo")
    for name, t in self_time.most_common(args.top):
        a = meta[name]
        ln = str(a.get("long_name", "") or a.get("tf_op", ""))
        print(
            f"{name[:36]:36s} {t / args.iters / 1e3:9.4f} "
            f"{counts[name] // max(args.iters, 1):6d} "
            f"{100 * t / max(total * 1e3, 1e-9):6.1f}  {ln[:70]}"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", default="tmp/trace")
    ap.add_argument("--iters", type=int, default=1, help="steps captured in the trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--raw", action="store_true", help="no name grouping")
    ap.add_argument(
        "--self",
        action="store_true",
        help="leaf-attributed self-time report (no double counting)",
    )
    args = ap.parse_args()

    path = find_trace(args.log_dir)
    events = load_events(path)
    if args.self:
        return self_time_report(events, path, args)

    # identify device lanes: process names containing "TPU" (or "/device:")
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()
    }
    # XLA op lanes are thread names like "XLA Ops" / "Steps"; keep complete events
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    by_op = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Op" not in lane and "Ops" not in lane:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        total += dur
        if not args.raw:
            for rx, g in GROUP_RULES:
                if rx.match(name):
                    name = g
                    break
        by_op[name] += dur
        counts[name] += 1

    print(f"trace: {path}")
    print(f"device lanes: {[pid_names[p] for p in dev_pids]}")
    print(f"total device op time: {total:.3f} ms over {args.iters} iters "
          f"-> {total / args.iters:.3f} ms/iter")
    print(f"{'op':44s} {'ms/iter':>10s} {'count':>8s} {'%':>6s}")
    for name, dur in by_op.most_common(args.top):
        print(
            f"{name[:44]:44s} {dur / args.iters:10.4f} {counts[name]:8d} "
            f"{100 * dur / max(total, 1e-9):6.1f}"
        )


if __name__ == "__main__":
    main()
