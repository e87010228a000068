#!/usr/bin/env python
"""Hyperparameter-sweep launcher (the reference's ``debug.py`` analog).

The reference ships ``debug.py`` — an argparse front-end that shells out
to ``tools/train.py`` with a wall of ``--cfg-options`` overrides
(``/root/reference/debug.py:27-60``), used as the de-facto sweep /
integration-test harness. This is the same capability, generalised:

    python tools/sweep.py configs/attnshift_voc12aug.py \
        --grid model.obj_tau=0.85,0.9,0.95 \
        --grid model.num_semantic_points=3,5 \
        --work-dir work_dirs/sweep -- --max-steps 200

runs the cartesian product sequentially (6 runs here), each in its own
``<work-dir>/<run-name>/`` with the overrides applied via the config
system's dotted paths, and prints a summary table of the last logged
train metrics (and eval metrics, when validation ran) per combination.

Everything after ``--`` is forwarded to ``tools/train.py`` verbatim.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def parse_args():
    argv = sys.argv[1:]
    extra: list[str] = []
    if "--" in argv:
        i = argv.index("--")
        argv, extra = argv[:i], argv[i + 1:]
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--grid", action="append", default=[], metavar="KEY=V1,V2",
                   help="dotted config key with comma-separated values; "
                        "repeat for a cartesian product")
    p.add_argument("--work-dir", default="work_dirs/sweep")
    p.add_argument("--dry-run", action="store_true",
                   help="print the commands without running them")
    return p.parse_args(argv), extra


def _axes(grid_specs: list[str]) -> list[tuple[str, list[str]]]:
    axes = []
    for spec in grid_specs:
        key, _, vals = spec.partition("=")
        if not vals:
            raise SystemExit(f"--grid needs KEY=V1,V2,... (got {spec!r})")
        axes.append((key, vals.split(",")))
    return axes


def _run_name(combo: list[tuple[str, str]]) -> str:
    return "_".join(f"{k.rsplit('.', 1)[-1]}-{v}" for k, v in combo) or "base"


def _last_metrics(work_dir: str) -> dict:
    """Last train_log.jsonl record, merged with any eval records after it."""
    path = os.path.join(work_dir, "train_log.jsonl")
    out: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    out.update(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return out


def main():
    args, extra = parse_args()
    axes = _axes(args.grid)
    combos = [list(zip([k for k, _ in axes], vals))
              for vals in itertools.product(*[v for _, v in axes])] or [[]]

    rows = []
    for combo in combos:
        name = _run_name(combo)
        wd = os.path.join(args.work_dir, name)
        cmd = [sys.executable, os.path.join(HERE, "train.py"), args.config,
               "--work-dir", wd]
        if combo:
            cmd += ["--cfg-options"] + [f"{k}={v}" for k, v in combo]
        cmd += extra
        print(f"[sweep] {name}: {' '.join(cmd)}", flush=True)
        if args.dry_run:
            continue
        rc = subprocess.call(cmd)
        rows.append((name, rc, _last_metrics(wd)))

    if args.dry_run:
        return
    # summary table: union of the numeric metric keys, one row per run
    keys = sorted({k for _, _, m in rows for k, v in m.items()
                   if isinstance(v, (int, float))})
    print("\n=== sweep summary ===")
    print("\t".join(["run", "rc"] + keys))
    for name, rc, m in rows:
        cells = [f"{m[k]:.4g}" if isinstance(m.get(k), (int, float)) else "-"
                 for k in keys]
        print("\t".join([name, str(rc)] + cells))


if __name__ == "__main__":
    main()
