"""Kernel-level breakdown of a jax.profiler trace (PERF.md round-3).

Parses the perfetto trace (``*.trace.json.gz``) that ``--profile-dir``
writes (via jax.profiler.start_trace, train/loops.py:215) and aggregates
device-track event durations by kernel family, so the training-step
optimization pass can see where the ~0.19 s device step actually goes —
the same methodology as PERF.md's round-1 sampling profile breakdown,
but scripted instead of eyeballed in trace_viewer.

Usage:
    python scripts/analyze_profile.py runs/profile_train [--top 25]
    python scripts/analyze_profile.py runs/profile_train --steps 12

With --steps N, also prints per-step ms (total device time / N).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    """Accept either a trace file or a profile dir (searched recursively)."""
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def kernel_family(name: str) -> str:
    """Group fusion.1234 / loop_fusion.5 style names into families."""
    name = re.sub(r"\.\d+$", "", name)
    name = re.sub(r"\d+$", "", name)
    return name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile dir or *.trace.json.gz file")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=None,
                    help="number of train steps traced (for per-step ms)")
    ap.add_argument("--track-filter", default="TPU|/device:|XLA Ops",
                    help="regex over process/thread names for device tracks")
    args = ap.parse_args()

    trace_file = find_trace(args.path)
    with gzip.open(trace_file, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # Map pid/tid -> names from metadata events, then keep only complete
    # ("X") events on tracks matching the device filter.
    proc_names = {}
    thread_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread_names[(ev["pid"], ev.get("tid"))] = \
                ev["args"].get("name", "")

    track_re = re.compile(args.track_filter, re.IGNORECASE)

    def on_device(ev):
        pname = proc_names.get(ev.get("pid"), "")
        tname = thread_names.get((ev.get("pid"), ev.get("tid")), "")
        return bool(track_re.search(pname) or track_re.search(tname))

    totals = collections.Counter()   # family -> total us
    counts = collections.Counter()
    total_us = 0.0
    span_lo, span_hi = float("inf"), 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev or not on_device(ev):
            continue
        fam = kernel_family(ev.get("name", "?"))
        dur = float(ev["dur"])
        totals[fam] += dur
        counts[fam] += 1
        total_us += dur
        ts = float(ev.get("ts", 0.0))
        span_lo = min(span_lo, ts)
        span_hi = max(span_hi, ts + dur)

    if not totals:
        tracks = sorted(set(proc_names.values())
                        | set(thread_names.values()))
        print(f"no device events matched {args.track_filter!r}; "
              f"tracks present: {tracks}", file=sys.stderr)
        raise SystemExit(1)

    span_ms = (span_hi - span_lo) / 1e3
    print(f"trace: {trace_file}")
    print(f"device busy time: {total_us / 1e3:.1f} ms over a "
          f"{span_ms:.1f} ms span "
          f"(occupancy {100 * total_us / 1e3 / span_ms:.0f}%)")
    if args.steps:
        print(f"per-step device time: {total_us / 1e3 / args.steps:.1f} ms "
              f"({args.steps} steps)")
    print()
    print(f"{'kernel family':52s} {'total ms':>9s} {'%':>6s} "
          f"{'count':>6s}" + ("  ms/step" if args.steps else ""))
    for fam, us in totals.most_common(args.top):
        line = (f"{fam[:52]:52s} {us / 1e3:9.1f} "
                f"{100 * us / total_us:5.1f}% {counts[fam]:6d}")
        if args.steps:
            line += f" {us / 1e3 / args.steps:8.2f}"
        print(line)


if __name__ == "__main__":
    main()
