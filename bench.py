"""Benchmark: attention-shift pseudo-mask generation throughput.

Measures images/sec/chip for the full pseudo-label pipeline (flagship
ViT-S backbone forward + attention rollout + Hungarian matching +
CAM->CCL candidate boxes + MIL selection + similarity refinement +
mean-shift semantic centers + mask point sampling) on the available
accelerator — the BASELINE.json headline metric.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

Hostile-environment hardening (round-1 lesson: the driver run recorded
rc=124 with no output):
- a SIGTERM/SIGINT handler and a wall-clock watchdog (``--budget-s``)
  both emit the best-so-far JSON (or an ``error`` JSON naming the phase
  reached) and exit, so *something* is always recorded;
- a tiny backend smoke matmul runs first — a dead accelerator fails
  fast with an error JSON instead of hanging in a 20-minute compile;
- the timed loop updates the best-so-far estimate after every step, so
  a mid-loop kill still reports a measured rate.

``vs_baseline``: the reference publishes no throughput numbers. The
10 img/s/GPU denominator is DERIVED in BASELINE.md ("Derivation of the
bench denominator"): an analytic speed-of-light bound for the reference
design on V100 (~40 img/s) over its structural serialisation costs
(per-map CCL host syncs, scipy LSA, Python stage loops) brackets the
plausible reference rate at 0.7-3 img/s; 10 is picked >=3x above that
band, i.e. conservative against us. vs_baseline = value / 10.0 and the
>5x north-star goal reads as vs_baseline > 5.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REF_GPU_ESTIMATE = 10.0  # img/s; no published reference throughput

# mutable progress state shared with the watchdog/signal handlers
_STATE = {
    "phase": "startup",     # startup -> smoke -> init -> compile -> timing -> done
    "value": None,           # best-so-far img/s/chip (None until measured)
    "partial": True,
    "emitted": False,
}
_EMIT_LOCK = threading.Lock()


def _emit(error: str | None = None) -> None:
    """Print the single JSON result line exactly once."""
    with _EMIT_LOCK:
        if _STATE["emitted"]:
            return
        _STATE["emitted"] = True
        rec = {
            "metric": _STATE.get("metric",
                                 "pseudomask_images_per_sec_per_chip"),
            "value": round(_STATE["value"], 3) if _STATE["value"] else 0.0,
            "unit": "img/s/chip",
            "vs_baseline": round((_STATE["value"] or 0.0) / REF_GPU_ESTIMATE, 3),
        }
        if _STATE.get("flops_per_img") and _STATE["value"]:
            # model FLOPs utilisation at the measured rate (v5e bf16 peak
            # 197 TF/s); an absolute efficiency figure alongside the
            # derived-denominator vs_baseline
            rec["mfu"] = round(
                _STATE["flops_per_img"] * _STATE["value"] / 197e12, 4
            )
        if _STATE["partial"]:
            rec["partial"] = True
            rec["phase"] = _STATE["phase"]
        if error:
            rec["error"] = error
        print(json.dumps(rec), flush=True)


def _die(reason: str) -> None:
    _emit(error=None if _STATE["value"] else reason)
    os._exit(0)


def _install_guards(budget_s: float) -> None:
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda s, f: _die(f"killed by signal {s} in phase {_STATE['phase']}"))
    t = threading.Timer(budget_s, lambda: _die(f"self-watchdog at {budget_s}s in phase {_STATE['phase']}"))
    t.daemon = True
    t.start()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--max-gt", type=int, default=20)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--budget-s", type=float, default=float(os.environ.get("BENCH_BUDGET_S", 1500)),
                    help="wall-clock watchdog: emit best-so-far JSON and exit at this age")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--ckpt", default=None, metavar="DIR",
                    help="params-only orbax checkpoint to bench instead of "
                         "random init (produce one with tools/analysis/"
                         "learning_check.py --save-ckpt DIR); trained "
                         "attention converges the CCL fixpoint faster, so "
                         "random init is the conservative default")
    ap.add_argument("--cam-stride", type=int, default=None,
                    help="override Stage-A CCL stride (1 = exact reference res)")
    ap.add_argument("--map-stride", type=int, default=None,
                    help="override Stage-B/C map stride (1 = exact reference res)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed loop "
                         "(view with tensorboard/xprof)")
    ap.add_argument("--model", default="vits", choices=["vits", "vitb"],
                    help="backbone size: vits = the VOC flagship (embed 384,"
                         " 6 heads); vitb = the paper's AttnShift-B COCO row"
                         " (embed 768, 12 heads, configs/attnshift_coco_vitb"
                         ".py) — VERDICT round-2 item 5")
    ap.add_argument("--remat", action="store_true",
                    help="activation checkpointing on the ViT blocks "
                         "(inference seed path rarely needs it; knob for "
                         "memory-cliff probing at vitb scale)")
    args = ap.parse_args()

    if args.model != "vits":
        # keep the driver's default metric name pinned to the flagship
        _STATE["metric"] = f"pseudomask_images_per_sec_per_chip_{args.model}"

    t_start = time.perf_counter()
    _install_guards(args.budget_s)

    # ---- phase: smoke — fail fast if the accelerator is dead ----
    _STATE["phase"] = "smoke"
    dev = jax.devices()[0]
    x = jax.device_put(jnp.ones((256, 256), jnp.float32), dev)
    s = float(jnp.sum(x @ x))
    if not np.isfinite(s):
        _die("backend smoke matmul returned non-finite")

    from attentionshift_tpu.models.detector import AttnShiftDetector

    _STATE["phase"] = "init"
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    on_tpu = dev.platform != "cpu"
    overrides = {}
    if args.cam_stride is not None:
        overrides["cam_stride"] = args.cam_stride
    if args.map_stride is not None:
        overrides["seed_map_stride"] = args.map_stride
    if args.model == "vitb":
        # AttnShift-B (configs/attnshift_coco_vitb.py): COCO classes
        overrides.update(embed_dim=768, num_heads=12, num_classes=80)
    model = AttnShiftDetector(
        num_classes=overrides.pop("num_classes", 20),
        embed_dim=overrides.pop("embed_dim", 384), depth=12,
        num_heads=overrides.pop("num_heads", 6), img_size=224,
        point_tokens=100, cam_layer=7, max_gt=args.max_gt,
        use_remat=args.remat,
        use_pallas_attention=on_tpu, use_pallas_ccl=on_tpu, dtype=dtype,
        pad_tokens_to=128, **overrides,
    )
    b, h, w, g = args.batch, args.height, args.width, args.max_gt
    rng = jax.random.PRNGKey(0)
    img = jax.device_put(
        jnp.asarray(np.random.RandomState(0).randn(b, h, w, 3), jnp.float32), dev
    )
    pts = jnp.tile(
        jnp.asarray(np.random.RandomState(1).rand(1, g, 2) * [w * 0.9, h * 0.9] + 10,
                    jnp.float32), (b, 1, 1))
    lbls = jnp.tile(jnp.asarray(np.random.RandomState(2).randint(0, 20, (1, g)),
                                jnp.int32), (b, 1))
    n_valid = min(8, g)
    valid = jnp.tile(jnp.asarray([[True] * n_valid + [False] * (g - n_valid)]), (b, 1))
    img_wh = jnp.tile(jnp.asarray([[float(w), float(h)]]), (b, 1))

    # jit the init: run eagerly it dispatches thousands of small ops
    # through the tunneled backend (~1.2ms RTT each, ~9 minutes total);
    # jitted it is one cacheable executable (~15s)
    params = jax.jit(
        lambda r: model.init(
            {"params": r, "sampling": r}, img, pts, lbls, valid, img_wh,
            method=type(model).seed_pseudo_gt,
        )
    )(rng)
    jax.block_until_ready(params)
    if args.ckpt:
        from attentionshift_tpu.train.checkpoint import restore_params

        trained = restore_params(os.path.abspath(args.ckpt))
        # Accept either a params-only tree or a full variables dict
        # (learning_check saves TrainState.params, i.e. the full dict).
        # The seed-only init here holds a SUBSET of the train-time tree
        # (backbone + MIL head), so merge by path: overwrite every init
        # leaf whose path exists in the checkpoint, keep init for the
        # rest, and require the backbone to be covered.
        src = trained.get("params", trained)
        lut = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(src)[0]
        }
        pleaves, tdef = jax.tree_util.tree_flatten_with_path(params["params"])
        hits = sum(jax.tree_util.keystr(p) in lut for p, _ in pleaves)
        if hits == 0:
            raise SystemExit(f"--ckpt {args.ckpt}: no matching parameter paths")
        merged = jax.tree_util.tree_unflatten(
            tdef,
            [jnp.asarray(lut.get(jax.tree_util.keystr(p), v), v.dtype)
             for p, v in pleaves],
        )
        params = {**params, "params": merged}
        print(f"loaded {hits}/{len(pleaves)} seed-path params from {args.ckpt}",
              file=sys.stderr)

    @jax.jit
    def seed(params, img, pts, lbls, valid, img_wh, key):
        return model.apply(
            params, img, pts, lbls, valid, img_wh,
            method=type(model).seed_pseudo_gt, rngs={"sampling": key},
        )

    def sync(o):
        # scalar fetch: forces the device queue to drain even on backends
        # whose block_until_ready is a no-op (the tunneled axon plugin)
        return float(jnp.sum(o["pseudo_gt_bboxes"]))

    # ---- phase: compile + warmup ----
    _STATE["phase"] = "compile"
    out = seed(params, img, pts, lbls, valid, img_wh, jax.random.PRNGKey(0))
    sync(out)
    # analytic FLOPs of the compiled step (XLA cost analysis) -> MFU in
    # the result line, so the headline rate is pinned to a
    # device-utilisation figure independent of the vs_baseline
    # denominator (VERDICT round-2 weak #2). v5e peak: 197 TF/s bf16.
    try:
        cost = seed.lower(
            params, img, pts, lbls, valid, img_wh, jax.random.PRNGKey(0)
        ).compile().cost_analysis()
        _STATE["flops_per_img"] = float(cost.get("flops", 0.0)) / b
    except Exception:
        _STATE["flops_per_img"] = 0.0
    t_compiled = time.perf_counter()
    for i in range(1, args.warmup):
        out = seed(params, img, pts, lbls, valid, img_wh, jax.random.PRNGKey(i))
        sync(out)
    # coarse post-warmup estimate (includes one host sync — a floor, not
    # the headline rate) so an early kill still reports a measured value
    t1 = time.perf_counter()
    out = seed(params, img, pts, lbls, valid, img_wh, jax.random.PRNGKey(99))
    sync(out)
    one_dt = max(time.perf_counter() - t1, 1e-6)
    _STATE["value"] = b / one_dt

    # scale the timed loop to the remaining budget (keep a 15% margin)
    remaining = args.budget_s - (time.perf_counter() - t_start)
    steps = max(1, min(args.steps, int(0.85 * remaining / max(one_dt, 1e-3))))

    # ---- phase: timing ----
    # Steps are enqueued in chunks with one sync per chunk: a per-step
    # host sync through the tunneled backend costs ~0.4s of RTT (vs a
    # ~30ms device step) and would dominate the measurement, while one
    # sync per chunk amortises it AND leaves the watchdog a true
    # best-so-far rate if it fires between chunks.
    _STATE["phase"] = "timing"
    import contextlib

    trace_ctx = (
        jax.profiler.trace(args.trace) if args.trace else contextlib.nullcontext()
    )
    chunk = 10
    with trace_ctx:
        t0 = time.perf_counter()
        done_steps = 0
        while done_steps < steps:
            n = min(chunk, steps - done_steps)
            for i in range(n):
                out = seed(params, img, pts, lbls, valid, img_wh,
                           jax.random.PRNGKey(100 + done_steps + i))
            sync(out)
            done_steps += n
            _STATE["value"] = done_steps * b / (time.perf_counter() - t0)
        dt = time.perf_counter() - t0

    _STATE["value"] = steps * b / dt
    _STATE["partial"] = False
    _STATE["phase"] = "done"
    _emit()


if __name__ == "__main__":
    main()
