"""Aggregate per-op device time from a jax.profiler xplane trace.

Usage:
    python bench.py --trace /tmp/trace --steps 12 --variants ""
    python tools/analysis/trace_ops.py /tmp/trace [--top 40] [--merge]

Walks the XLA-op lines of the TPU device plane and prints total/self
duration per op name, the profile-guided replacement for the round-3
``hlo_stats`` pass (commit acf61e5): the top rows ARE the optimization
worklist.

``--merge`` folds fusion instances (``fusion.123``) into one row per
fusion root so repeated fusions aggregate.
"""

from __future__ import annotations

import argparse
import collections
import gzip
import os
import re
import sys


def load_xspaces(trace_dir: str):
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    out = []
    for root, _dirs, files in os.walk(trace_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                xs = xplane_pb2.XSpace()
                with open(os.path.join(root, f), "rb") as fh:
                    xs.ParseFromString(fh.read())
                out.append(xs)
            elif f.endswith(".xplane.pb.gz"):
                xs = xplane_pb2.XSpace()
                with gzip.open(os.path.join(root, f), "rb") as fh:
                    xs.ParseFromString(fh.read())
                out.append(xs)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--merge", action="store_true",
                    help="fold `op.N` instance suffixes together")
    ap.add_argument("--plane", default=None,
                    help="substring of the device plane name "
                         "(default: first plane containing 'TPU', else "
                         "the busiest device plane)")
    args = ap.parse_args()

    spaces = load_xspaces(args.trace_dir)
    if not spaces:
        sys.exit(f"no .xplane.pb under {args.trace_dir}")

    per_op = collections.Counter()
    n_events = 0
    plane_names = []
    for xs in spaces:
        for plane in xs.planes:
            plane_names.append(plane.name)
            if args.plane is not None:
                if args.plane not in plane.name:
                    continue
            elif "TPU" not in plane.name and "/device:" not in plane.name:
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                # XLA op lines carry the per-op events; step/module lines
                # would double-count their children
                lname = line.name.lower()
                if "xla op" not in lname and "xla ops" not in lname:
                    continue
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    per_op[name] += ev.duration_ps
                    n_events += 1
    if not per_op:
        print("planes seen:", *plane_names, sep="\n  ")
        sys.exit("no 'XLA Ops' line events found (is this a device trace?)")

    if args.merge:
        merged = collections.Counter()
        for name, d in per_op.items():
            merged[re.sub(r"\.\d+$", "", name)] += d
        per_op = merged

    total = sum(per_op.values())
    print(f"{n_events} op events, total device time "
          f"{total / 1e9:.3f} ms (all steps summed)\n")
    print(f"{'op':<64s} {'ms':>9s} {'%':>6s}")
    for name, d in per_op.most_common(args.top):
        print(f"{name[:64]:<64s} {d / 1e9:9.3f} {100 * d / total:6.2f}")


if __name__ == "__main__":
    main()
