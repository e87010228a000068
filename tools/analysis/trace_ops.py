"""Aggregate per-op device time from a jax.profiler trace.

Usage:
    python bench.py --trace /tmp/trace --steps 12 --variants ""
    python tools/analysis/trace_ops.py /tmp/trace [--top 40] [--no-merge]

Parses the Chrome-format ``*.trace.json.gz`` the profiler writes, walks
the device plane's "XLA Ops" lane, and prints total duration per op —
the profile-guided replacement for the round-3 ``hlo_stats`` pass
(commit acf61e5): the top rows ARE the optimization worklist.

Fusion instances (``fusion.123``) merge into one row per root by
default (``--no-merge`` to keep instances separate).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--no-merge", action="store_true",
                    help="keep `op.N` instances separate")
    ap.add_argument("--lane", default="XLA Ops",
                    help="device-plane thread to aggregate")
    args = ap.parse_args()

    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        sys.exit(f"no *.trace.json.gz under {args.trace_dir}")

    per_op = collections.Counter()
    n_events = 0
    for path in paths:
        with gzip.open(path, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        dev_pids, lane_tids = set(), set()
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                if "/device:" in e["args"].get("name", ""):
                    dev_pids.add(e["pid"])
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                if e["args"].get("name") == args.lane:
                    lane_tids.add((e["pid"], e["tid"]))
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in dev_pids:
                continue
            if (e["pid"], e.get("tid")) not in lane_tids:
                continue
            per_op[e["name"]] += e.get("dur", 0)  # microseconds
            n_events += 1

    if not per_op:
        sys.exit(f"no '{args.lane}' events found in {paths}")
    if not args.no_merge:
        merged = collections.Counter()
        for name, d in per_op.items():
            merged[re.sub(r"\.\d+$", "", name)] += d
        per_op = merged

    total = sum(per_op.values())
    print(f"{n_events} op events, total device time {total / 1e3:.3f} ms "
          "(all steps summed)\n")
    print(f"{'op':<72s} {'ms':>9s} {'%':>6s}")
    for name, d in per_op.most_common(args.top):
        print(f"{name[:72]:<72s} {d / 1e3:9.3f} {100 * d / total:6.2f}")


if __name__ == "__main__":
    main()
