"""Corruption-robustness benchmark (reference ``test_robustness.py`` +
``robustness_eval.py`` in one tool).

Evaluates the model on the clean val set (performance P) and on each
requested corruption x severity, then reports the corruption benchmark
summary: per-corruption mean AP over severities (PC), mean PC across
corruptions (mPC), and relative mPC / P (rPC).

    python tools/analysis/test_robustness.py CONFIG CHECKPOINT \
        [--corruptions gaussian_noise motion_blur ...] \
        [--severities 1 3 5] [--metric mAP@0.5] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np


def parse_args():
    from attentionshift_tpu.data.corruptions import CORRUPTIONS

    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--corruptions", nargs="*", default=sorted(CORRUPTIONS),
                   choices=sorted(CORRUPTIONS))
    p.add_argument("--severities", type=int, nargs="*", default=[1, 2, 3, 4, 5])
    p.add_argument("--metric", default="mAP@0.5",
                   help="key of the evaluate() result used for the summary")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out", default=None, help="dump the full table as json")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from attentionshift_tpu.config import Config
    from attentionshift_tpu.data.build import build_eval_dataset
    from attentionshift_tpu.data.corruptions import CorruptedDataset
    from attentionshift_tpu.eval.runner import evaluate
    from attentionshift_tpu.models.detector import AttnShiftDetector

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    model = AttnShiftDetector(**cfg.model.to_dict())
    dataset = build_eval_dataset(cfg.data.val.to_dict())

    from attentionshift_tpu.data.pipeline import TestPipeline

    rng = jax.random.PRNGKey(0)
    bh, bw = TestPipeline(scale=tuple(cfg.data.test_scale)).bucket_hw
    g = int(cfg.data.max_gt)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": rng, "sampling": rng, "dropout": rng},
            jnp.zeros((1, bh, bw, 3), jnp.float32),
            jnp.zeros((1, g, 2), jnp.float32),
            jnp.zeros((1, g), jnp.int32),
            jnp.zeros((1, g), bool),
            jnp.asarray([[float(bw), float(bh)]], jnp.float32),
        )
    )
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    if args.checkpoint:
        from attentionshift_tpu.train import restore_params

        params = restore_params(args.checkpoint)

    def run(ds):
        res = evaluate(
            model, params, ds, test_scale=tuple(cfg.data.test_scale),
            limit=args.limit, num_classes=int(cfg.model.num_classes),
            verbose=False,
        )
        return float(res[args.metric])

    table = {"clean": run(dataset)}
    print(f"clean {args.metric}: {table['clean']:.4f}", flush=True)
    for name in args.corruptions:
        per_sev = {}
        for sev in args.severities:
            per_sev[sev] = run(CorruptedDataset(dataset, name, sev))
            print(f"{name} s{sev}: {per_sev[sev]:.4f}", flush=True)
        table[name] = per_sev

    pcs = {n: float(np.mean(list(v.values())))
           for n, v in table.items() if n != "clean"}
    summary = dict(
        P=table["clean"],
        PC=pcs,
        mPC=float(np.mean(list(pcs.values()))) if pcs else None,
    )
    if pcs and table["clean"] > 0:
        summary["rPC"] = summary["mPC"] / table["clean"]
    out = dict(metric=args.metric, table=table, summary=summary)
    print(json.dumps(out["summary"], indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
