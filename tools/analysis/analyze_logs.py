#!/usr/bin/env python
"""Training-log analysis (the `tools/analysis_tools/analyze_logs.py`
analog) over the jsonl files written by tools/train.py.

    python tools/analysis/analyze_logs.py plot work_dirs/voc/train_log.jsonl \
        --keys loss_total loss_mask --out curves.png
    python tools/analysis/analyze_logs.py time work_dirs/voc/train_log.jsonl
"""

from __future__ import annotations

import argparse
import json


def load(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def cmd_time(records):
    by_epoch = {}
    for r in records:
        by_epoch.setdefault(r.get("epoch", 0), []).append(r)
    for ep, rows in sorted(by_epoch.items()):
        print(f"epoch {ep}: {len(rows)} logged iters, "
              f"final loss_total {rows[-1].get('loss_total', float('nan')):.4f}")


def cmd_plot(records, keys, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = list(range(len(records)))
    for k in keys:
        ys = [r.get(k) for r in records]
        plt.plot(xs, ys, label=k)
    plt.xlabel("log step")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["plot", "time"])
    p.add_argument("jsonl")
    p.add_argument("--keys", nargs="*", default=["loss_total"])
    p.add_argument("--out", default="curves.png")
    args = p.parse_args()
    records = load(args.jsonl)
    if args.cmd == "time":
        cmd_time(records)
    else:
        cmd_plot(records, args.keys, args.out)


if __name__ == "__main__":
    main()
