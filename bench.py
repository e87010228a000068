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
        for key in ("value_wallclock", "rtt_correction_s_per_sync",
                    "config", "strides", "variants", "regressions"):
            if _STATE.get(key) is not None:
                rec[key] = _STATE[key]
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


def _build_model(config_path: str, args, on_tpu: bool, **overrides):
    """Model from the SHIPPED config file (VERDICT round-3 item 2: the
    headline bench measures the flagship config, one source of truth),
    plus runtime knobs (dtype/pallas/padding) and explicit overrides."""
    from attentionshift_tpu.config import Config
    from attentionshift_tpu.models.detector import AttnShiftDetector

    cfg = Config.fromfile(config_path)
    kw = cfg.model.to_dict()
    kw.update(
        max_gt=args.max_gt,
        use_remat=bool(args.remat) or kw.get("use_remat", False),
        use_pallas_attention=on_tpu, use_pallas_ccl=on_tpu,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        pad_tokens_to=128,
    )
    # bench-time remat default: the seed path is inference-only and fits
    # without it; the config's train-time True would only slow the bench
    if not args.remat:
        kw["use_remat"] = False
    kw.update({k: v for k, v in overrides.items() if v is not None})
    return AttnShiftDetector(**kw), kw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--max-gt", type=int, default=20)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--budget-s", type=float, default=float(os.environ.get("BENCH_BUDGET_S", 1500)),
                    help="wall-clock watchdog: emit best-so-far JSON and exit at this age")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--config", default=None, metavar="PY",
                    help="config file whose `model` block to bench "
                         "(default: the flagship configs/attnshift_voc12aug"
                         ".py, or the AttnShift-B COCO config with --model "
                         "vitb)")
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
    ap.add_argument("--variants", default="train_step,infer,vitb,exact,aug_test",
                    help="comma list of secondary measurements recorded in "
                         "the JSON `variants` field after the headline: "
                         "`train_step` (full fwd+bwd+layer-decay-AdamW step "
                         "at the bench shape), `infer` (simple_test incl. "
                         "NMS + mask head), `aug_test` (the 6-scale x flip "
                         "reference eval protocol, s/img), `vitb` "
                         "(AttnShift-B config) and/or `exact` (cam/map "
                         "stride 1 = exact reference semantics); empty "
                         "string disables. Each runs only if enough of "
                         "--budget-s remains.")
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
    # host<->device sync cost (tunneled backends: tens of ms of RTT) —
    # measured so the timed loop can subtract its per-chunk syncs instead
    # of folding launch overhead into the device rate
    y = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(y))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(y))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    _STATE["phase"] = "init"
    on_tpu = dev.platform != "cpu"
    here = os.path.dirname(os.path.abspath(__file__))
    config_path = args.config or os.path.join(
        here, "configs",
        "attnshift_coco_vitb.py" if args.model == "vitb" else "attnshift_voc12aug.py",
    )
    model, model_kw = _build_model(
        config_path, args, on_tpu,
        cam_stride=args.cam_stride, seed_map_stride=args.map_stride,
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

    def sync_any(o):
        # same drain for arbitrary pytrees (variant outputs: metric
        # dicts, TestOutputs namedtuples)
        return float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))

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
    # host sync through the tunneled backend costs tens of ms of RTT (vs
    # a ~15-20ms device step) and would dominate the measurement; one
    # sync per chunk amortises it AND leaves the watchdog a true
    # best-so-far rate if it fires between chunks. The measured RTT of
    # each chunk sync is subtracted so the reported rate is DEVICE time,
    # not launch overhead (round-4 finding: at chunk=10 the old loop
    # under-reported throughput by ~10%).
    _STATE["phase"] = "timing"
    import contextlib

    trace_ctx = (
        jax.profiler.trace(args.trace) if args.trace else contextlib.nullcontext()
    )
    chunk = 25
    with trace_ctx:
        t0 = time.perf_counter()
        done_steps = 0
        nsync = 0
        while done_steps < steps:
            n = min(chunk, steps - done_steps)
            for i in range(n):
                out = seed(params, img, pts, lbls, valid, img_wh,
                           jax.random.PRNGKey(100 + done_steps + i))
            sync(out)
            nsync += 1
            done_steps += n
            _STATE["value"] = done_steps * b / max(
                time.perf_counter() - t0 - nsync * rtt, 1e-6)
        dt = max(time.perf_counter() - t0 - nsync * rtt, 1e-6)

    _STATE["value"] = steps * b / dt
    # auditability (ADVICE r4): emit the raw wall-clock rate AND the RTT
    # correction magnitude next to the corrected headline, so cross-round
    # comparisons (rounds 1-3 were raw wall-clock) and the size of the
    # correction stay checkable from the JSON alone
    raw_dt = dt + nsync * rtt
    _STATE["value_wallclock"] = round(steps * b / raw_dt, 3)
    _STATE["rtt_correction_s_per_sync"] = round(rtt, 4)
    _STATE["config"] = os.path.relpath(config_path, here)
    _STATE["strides"] = [int(model.cam_stride), int(model.seed_map_stride)]

    # ---- phase: variants — secondary recorded measurements ----
    # `exact`: cam/map stride 1 (bit-exact reference semantics); `vitb`:
    # the AttnShift-B config at the same frame size. Each runs only when
    # enough budget remains; failures are recorded, never fatal.
    want = [v for v in args.variants.split(",") if v] if args.variants else []
    if args.model == "vitb" and "vitb" in want:
        want.remove("vitb")  # headline IS vitb
    # the headline is complete here: a watchdog/SIGTERM during the
    # variants phase must not mark the recorded headline partial
    _STATE["partial"] = False

    variants = {}
    # minimum remaining budget per variant (compile-cost dominated; the
    # aug_test protocol jits 12 padded shapes x 3 stage functions)
    need_s = {"train_step": 600, "aug_test": 900}
    for name in want:
        remaining = args.budget_s - (time.perf_counter() - t_start)
        if remaining < need_s.get(name, 420):  # compile alone can eat minutes
            variants[name] = "skipped:budget"
            continue
        _STATE["phase"] = f"variant:{name}"
        try:
            if name == "train_step":
                # the SHIPPED training surface (VERDICT r4 #2): full
                # fwd + bwd + layer-decay AdamW at the bench shape,
                # remat on (as the train config runs it)
                from attentionshift_tpu.train import (
                    TrainState, build_optimizer, make_train_step,
                )

                vmodel, vkw = _build_model(config_path, args, on_tpu,
                                           use_remat=True)
                tparams = jax.jit(
                    lambda r: vmodel.init(
                        {"params": r, "sampling": r, "dropout": r},
                        img, pts, lbls, valid, img_wh,
                    )
                )(rng)
                jax.block_until_ready(tparams)
                tx = build_optimizer(
                    tparams, base_lr=1e-4, steps_per_epoch=100,
                    accumulate_steps=1, depth=int(vkw.get("depth", 12)),
                )
                tstate = TrainState.create(tparams, tx)
                step_fn = make_train_step(vmodel, donate=False)
                tbatch = dict(img=img, gt_points=pts, gt_labels=lbls,
                              gt_valid=valid, img_wh=img_wh)
                # warm TWICE: the first call's host-layout inputs make
                # XLA emit a second executable when the returned state
                # (device layouts) is fed back — one more compile, no
                # retrace. Timing must start after layouts stabilise.
                tstate, m = step_fn(tstate, tbatch, jax.random.PRNGKey(0))
                sync_any(m)  # compile + warm (host-layout executable)
                tstate, m = step_fn(tstate, tbatch, jax.random.PRNGKey(1))
                sync_any(m)  # device-layout executable
                vsteps = 10
                t0 = time.perf_counter()
                for i in range(vsteps):
                    tstate, m = step_fn(tstate, tbatch,
                                        jax.random.PRNGKey(300 + i))
                sync_any(m)
                vdt = max(time.perf_counter() - t0 - rtt, 1e-6)
                variants[name] = {
                    "img_per_s": round(vsteps * b / vdt, 3),
                    "ms_per_img": round(vdt / (vsteps * b) * 1e3, 2),
                }
                del tstate, tparams
                continue
            if name == "infer":
                vmodel, _ = _build_model(config_path, args, on_tpu)
                iparams = jax.jit(
                    lambda r: vmodel.init(
                        r, img, img_wh, method=type(vmodel).simple_test)
                )(rng)
                jax.block_until_ready(iparams)

                @jax.jit
                def itest(p, im, wh, _m=vmodel):
                    return _m.apply(p, im, wh, method=type(_m).simple_test)

                sync_any(itest(iparams, img, img_wh))
                vsteps = 20
                t0 = time.perf_counter()
                for _ in range(vsteps):
                    iout = itest(iparams, img, img_wh)
                sync_any(iout)
                vdt = max(time.perf_counter() - t0 - rtt, 1e-6)
                variants[name] = {
                    "img_per_s": round(vsteps * b / vdt, 3),
                    "ms_per_img": round(vdt / (vsteps * b) * 1e3, 2),
                }
                del iparams
                continue
            if name == "aug_test":
                # the reference's 6-scale x flip protocol, s/img
                # (tools/test.py scale list; 12 forwards per image)
                from attentionshift_tpu.eval.aug_test import AugTester

                vmodel, _ = _build_model(config_path, args, on_tpu)
                aparams = jax.jit(
                    lambda r: vmodel.init(
                        r, img, img_wh, method=type(vmodel).simple_test)
                )(rng)
                jax.block_until_ready(aparams)
                scales = [(800, 1333), (600, 1333), (400, 1333),
                          (800, 1000), (600, 1000), (400, 1000)]
                tester = AugTester(vmodel, aparams, scales=scales, flip=True)
                aimg = (np.random.RandomState(0).rand(500, 375, 3)
                        * 255).astype(np.uint8)
                tester(aimg)  # compile all 12 aug shapes
                t0 = time.perf_counter()
                tester(aimg)
                tester(aimg)
                variants[name] = {
                    "s_per_img": round((time.perf_counter() - t0) / 2, 3)
                }
                del aparams
                continue
            if name == "exact":
                vmodel, _ = _build_model(config_path, args, on_tpu,
                                         cam_stride=1, seed_map_stride=1)
                vsteps = 6
            elif name == "vitb":
                vmodel, _ = _build_model(
                    os.path.join(here, "configs", "attnshift_coco_vitb.py"),
                    args, on_tpu,
                    cam_stride=args.cam_stride, seed_map_stride=args.map_stride)
                vsteps = 12
            else:
                variants[name] = "skipped:unknown"
                continue
            vparams = jax.jit(
                lambda r: vmodel.init(
                    {"params": r, "sampling": r}, img, pts, lbls, valid, img_wh,
                    method=type(vmodel).seed_pseudo_gt,
                )
            )(rng)
            jax.block_until_ready(vparams)

            @jax.jit
            def vseed(p, im, pt, lb, va, wh, key, _m=vmodel):
                return _m.apply(p, im, pt, lb, va, wh,
                                method=type(_m).seed_pseudo_gt,
                                rngs={"sampling": key})

            sync(vseed(vparams, img, pts, lbls, valid, img_wh,
                       jax.random.PRNGKey(0)))
            t0 = time.perf_counter()
            for i in range(vsteps):
                vout = vseed(vparams, img, pts, lbls, valid, img_wh,
                             jax.random.PRNGKey(200 + i))
            sync(vout)
            vdt = max(time.perf_counter() - t0 - rtt, 1e-6)
            variants[name] = round(vsteps * b / vdt, 3)
        except Exception as e:  # record, don't kill the headline
            variants[name] = f"error:{type(e).__name__}:{str(e)[:160]}"
    if variants:
        _STATE["variants"] = variants

    # ---- regression bounds (VERDICT r4 #2): committed floor/ceiling
    # numbers for every benched surface; violations are recorded in the
    # JSON so the driver-run bench IS the hardware-perf CI gate.
    bounds_path = os.path.join(here, "bench_bounds.json")
    if os.path.exists(bounds_path) and args.model == "vits":
        with open(bounds_path) as f:
            bounds = json.load(f)

        def lookup(path):
            node = {"headline": _STATE["value"], "mfu": None, **(
                {"variants": variants} if variants else {})}
            if path == "mfu" and _STATE.get("flops_per_img") and _STATE["value"]:
                return _STATE["flops_per_img"] * _STATE["value"] / 197e12
            for part in path.split("."):
                if not isinstance(node, dict) or part not in node:
                    return None
                node = node[part]
            return node if isinstance(node, (int, float)) else None

        regressions = []
        for path, spec in bounds.items():
            got = lookup(path)
            if got is None:
                continue
            if "min" in spec and got < spec["min"]:
                regressions.append(f"{path}: {round(got, 3)} < min {spec['min']}")
            if "max" in spec and got > spec["max"]:
                regressions.append(f"{path}: {round(got, 3)} > max {spec['max']}")
        if regressions:
            _STATE["regressions"] = regressions

    _STATE["partial"] = False
    _STATE["phase"] = "done"
    _emit()


if __name__ == "__main__":
    main()
