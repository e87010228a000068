"""Connected-components labeling on accelerator.

TPU-native replacement for the reference's CUDA BUF union-find kernel
(``cc_torch.connected_components_labeling``, used on the pseudo-label hot
path at `stdroi_point_deform_attn_reppoints.py:23,68`). Instead of a
union-find (data-dependent memory traffic), we run iterative min-label
propagation with pointer jumping:

1. every foreground pixel starts with its own flat index as label,
2. each sweep takes the min label over the 3x3 (8-conn) or cross (4-conn)
   neighbourhood, then min-propagates along ENTIRE foreground runs of
   every row and column with segmented ``associative_scan``s (both
   directions) — one sweep crosses arbitrarily long straight stretches,
   so iterations scale with the number of "turns" in a component, not
   its diameter,
3. a ``lax.while_loop`` runs to fixpoint with a safety iteration cap.

All ops are vector ops (reduce_window / scans) — no gathers, which are
the slow path on TPU (an earlier pointer-jumping formulation spent
~600ms/step in gather-heavy sweeps; this one runs in <1ms).

Output semantics match cc_torch: background = 0, each component gets a
distinct positive id (here: min flat index in the component + 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # TPU compiler knobs (absent on pure-CPU jax builds)
    from jax.experimental.pallas import tpu as pltpu

    _COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
except Exception:  # pragma: no cover
    _COMPILER_PARAMS = None

__all__ = ["connected_components", "connected_components_batch"]


def _neighbor_min(labels: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    if connectivity == 8:
        return jax.lax.reduce_window(
            labels,
            jnp.asarray(jnp.iinfo(jnp.int32).max, labels.dtype),
            jax.lax.min,
            window_dimensions=(3, 3),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
        )
    elif connectivity == 4:
        big = jnp.asarray(jnp.iinfo(jnp.int32).max, labels.dtype)
        horiz = jax.lax.reduce_window(
            labels, big, jax.lax.min, (1, 3), (1, 1), ((0, 0), (1, 1))
        )
        vert = jax.lax.reduce_window(
            labels, big, jax.lax.min, (3, 1), (1, 1), ((1, 1), (0, 0))
        )
        return jnp.minimum(horiz, vert)
    raise ValueError(f"connectivity must be 4 or 8, got {connectivity}")


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def connected_components(
    mask: jnp.ndarray, connectivity: int = 8, max_iters: int = 256
) -> jnp.ndarray:
    """Label connected components of a binary (H, W) mask.

    Args:
        mask: (H, W) bool / {0,1} array; nonzero = foreground.
        connectivity: 8 (default, matches cc_torch) or 4.
        max_iters: safety cap on propagation sweeps. Each sweep includes
            two pointer-jumping passes, so even worst-case serpentine
            shapes of length ``O(H*W)`` converge in far fewer sweeps.

    Returns:
        (H, W) int32 labels; 0 = background, components numbered by
        ``min flat index + 1``.
    """
    h, w = mask.shape
    fg = mask.astype(jnp.bool_)
    big = jnp.iinfo(jnp.int32).max
    init = jnp.where(
        fg, jnp.arange(h * w, dtype=jnp.int32).reshape(h, w), big
    )

    blocked = ~fg

    def seg_scan(vals, axis, reverse):
        # min-propagate within contiguous fg runs along one axis
        def combine(a, b):
            av, ab = a
            bv, bb = b
            return jnp.where(bb, bv, jnp.minimum(av, bv)), ab | bb

        v, _ = jax.lax.associative_scan(
            combine, (vals, blocked), axis=axis, reverse=reverse
        )
        return v

    def sweep(labels):
        nmin = _neighbor_min(labels, connectivity)
        labels = jnp.where(fg, jnp.minimum(labels, nmin), big)
        for axis in (0, 1):
            labels = seg_scan(labels, axis, False)
            labels = seg_scan(labels, axis, True)
        return jnp.where(fg, labels, big)

    def cond(state):
        labels, prev_changed, it = state
        return jnp.logical_and(prev_changed, it < max_iters)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return jnp.where(fg, labels + 1, 0).astype(jnp.int32)


# --------------------------------------------------------------- batched
def _shift(x: jnp.ndarray, s: int, axis: int, fill_val, forward: bool) -> jnp.ndarray:
    """x shifted by s along axis (static s, slice+concat, `fill_val` pad).

    forward=True reads the element s BEFORE (prepends fill); False reads
    the element s AFTER (appends fill). No `rev`/gather — pallas-safe.
    """
    n = x.shape[axis]
    fill_shape = list(x.shape)
    fill_shape[axis] = s
    fill = jnp.full(fill_shape, fill_val, x.dtype)
    starts = [0] * x.ndim
    limits = list(x.shape)
    if forward:
        limits[axis] = n - s
        return jnp.concatenate([fill, jax.lax.slice(x, starts, limits)], axis=axis)
    starts[axis] = s
    return jnp.concatenate([jax.lax.slice(x, starts, limits), fill], axis=axis)


def _batch_sweep_body(fg, big):
    """Build the sweep fn over (M, H, W) labels (shared by kernel + jnp).

    All mask state is an int dtype (0/1): Mosaic cannot shift/concat i1
    vectors. Masks ride ``big``'s dtype so int16 labeling halves their
    traffic too.
    """
    idt = big.dtype
    blocked0 = (1 - fg.astype(jnp.int32)).astype(idt)
    m, h, w = fg.shape

    def seg_scan(vals, axis, reverse):
        # Hillis-Steele segmented min-scan with static power-of-2 shifts;
        # reverse scans shift the opposite direction (no flips: `rev` has
        # no pallas TPU lowering)
        v = vals
        b = blocked0
        fwd = not reverse
        s = 1
        n = vals.shape[axis]
        while s < n:
            v2 = _shift(v, s, axis, big, fwd)
            b2 = _shift(b, s, axis, jnp.asarray(1, idt), fwd)
            v = jnp.where(b == 1, v, jnp.minimum(v, v2))
            b = jnp.maximum(b, b2)
            s *= 2
        return v

    def neighbor_min(labels):
        # separable 3x3 min (horizontal pass then vertical): 4 shifted
        # slices instead of 8. Includes the centre — harmless, the sweep
        # takes min(labels, neighbor_min(labels)) anyway, and the
        # separable closure of the 8-neighbourhood equals the full
        # window min for the min semiring.
        ph = jnp.pad(labels, ((0, 0), (0, 0), (1, 1)), constant_values=big)
        hmin = jnp.minimum(
            jnp.minimum(labels, jax.lax.slice(ph, (0, 0, 0), (m, h, w))),
            jax.lax.slice(ph, (0, 0, 2), (m, h, w + 2)),
        )
        pv = jnp.pad(hmin, ((0, 0), (1, 1), (0, 0)), constant_values=big)
        return jnp.minimum(
            jnp.minimum(hmin, jax.lax.slice(pv, (0, 0, 0), (m, h, w))),
            jax.lax.slice(pv, (0, 2, 0), (m, h + 2, w)),
        )

    def sweep(labels):
        labels = jnp.where(fg, jnp.minimum(labels, neighbor_min(labels)), big)
        for axis in (1, 2):
            labels = seg_scan(labels, axis, False)
            labels = seg_scan(labels, axis, True)
        return jnp.where(fg, labels, big)

    return sweep


def _ccl_batch_kernel(fg_ref, out_ref, *, max_iters, transposed=False,
                      label_dtype=jnp.int32):
    fg = fg_ref[...] != 0  # (M, H, W) — or (M, W, H) when transposed
    m, h, w = fg.shape
    # NOTE (round 4): int16 labels (planes < 2^15 cells) were tried to
    # halve sweep traffic; Mosaic rejected the mixed 16-bit/boolean
    # select layouts on-chip ("Invalid relayout ... vector<...xi1>").
    # Labels stay int32.
    big = jnp.int32(2**30)
    if transposed:
        # maps arrive as (M, W_orig, H_orig): axis1 = original x, axis2 =
        # original y. Labels must stay min-ORIGINAL-flat-index (+1) for
        # cc_torch parity: orig_flat = y * W_orig + x, and W_orig is this
        # array's axis-1 extent (named h in kernel-local terms).
        iota = jax.lax.broadcasted_iota(jnp.int32, (m, h, w), 2) * h + \
            jax.lax.broadcasted_iota(jnp.int32, (m, h, w), 1)
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (m, h, w), 1) * w + \
            jax.lax.broadcasted_iota(jnp.int32, (m, h, w), 2)
    init = jnp.where(fg, iota.astype(label_dtype), big)
    sweep = _batch_sweep_body(fg, big)

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    out_ref[...] = jnp.where(fg, labels.astype(jnp.int32) + 1, 0)


def connected_components_batch(
    masks: jnp.ndarray,
    connectivity: int = 8,
    max_iters: int = 256,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Label many (M, H, W) masks at once.

    With ``use_pallas`` the whole fixpoint loop runs inside ONE kernel
    with all labels VMEM-resident — no HBM roundtrip per sweep (the
    dominant cost of the XLA formulation: ~36ms -> ~few ms for 56 maps
    of 64x64 on v5e). 8-connectivity only (the cc_torch semantics).
    Fallback: vmap of ``connected_components``.
    """
    if not use_pallas or connectivity != 8:
        return jax.vmap(
            lambda m: connected_components(m, connectivity, max_iters)
        )(masks)

    from jax.experimental import pallas as pl

    m, h, w = masks.shape
    # lane layout: last axis pads to 128 lanes, second-to-last to 8
    # sublanes. When the transposed orientation wastes less padded area
    # (e.g. 100x168 -> 104x256 = 26.6k cells vs 168x128 = 21.5k), run the
    # kernel on transposed maps — the 8-conn sweep is transpose-invariant
    # and the kernel's iota keeps original-flat-index label semantics.
    def padded(a, b):
        return ((a + 7) // 8 * 8) * ((b + 127) // 128 * 128)

    transposed = padded(w, h) < padded(h, w)
    if transposed:
        masks = masks.transpose(0, 2, 1)
        h, w = w, h
    # tile the map axis: each grid program converges its own chunk in
    # VMEM (sized to stay under the scoped-vmem limit with temporaries)
    w_lanes = (w + 127) // 128 * 128  # lane padding
    h_sub = (h + 7) // 8 * 8
    per_map = h_sub * w_lanes * 4
    tile = m
    # ~12 live temporaries during a sweep (measured against Mosaic's
    # scoped-vmem accounting); keep the stack under ~10MB. Round 4 A/B:
    # a 60MB budget (tile 8 -> 56, 3 grid programs) measured ~8% SLOWER
    # end-to-end — each program's while runs max-sweeps over its whole
    # tile, so small tiles of all-converged (zero/padding) planes exit
    # after one sweep while big mixed tiles drag them along.
    while tile > 1 and tile * per_map * 12 > 10 * 2**20:
        tile = (tile + 1) // 2
    if tile * per_map * 12 > 10 * 2**20:
        # a single plane no longer fits VMEM-resident (cam_stride<=2 at
        # 800x1344): stream through HBM via the XLA segmented-scan path
        # instead of tripping Mosaic's scoped-vmem stack limit
        return jax.vmap(
            lambda p: connected_components(p, connectivity, max_iters)
        )(masks.transpose(0, 2, 1) if transposed else masks)
    pad_m = (m + tile - 1) // tile * tile
    x = masks.astype(jnp.int32)
    if pad_m != m:
        x = jnp.pad(x, ((0, pad_m - m), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _ccl_batch_kernel, max_iters=max_iters, transposed=transposed,
        ),
        grid=(pad_m // tile,),
        in_specs=[pl.BlockSpec((tile, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((tile, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((pad_m, h, w), jnp.int32),
        compiler_params=_COMPILER_PARAMS,
    )(x)
    if transposed:
        out = out.transpose(0, 2, 1)
    return out[:m]
