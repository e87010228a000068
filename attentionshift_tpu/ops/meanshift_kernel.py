"""Fused cosine mean-shift fixpoint (Stage C) as one Pallas kernel.

The XLA formulation of ``cosine_shift_batch`` (pseudo/meanshift.py)
materialises the (G, K, N) similarity block in HBM several times per
shift iteration — round-4 trace: ~3.3 ms/step at the bench shape
(G=20, K=20, N=4200, D=384), bandwidth-bound on those intermediates,
insensitive to operand dtype. This kernel is the BASELINE.json north
star's stated design ("the iterative attention-shift step becomes a
fixed-point loop of fused distance+softmax-assignment kernels"): the
grid is (G,), both feature layouts stay VMEM-resident across the whole
fixpoint, and every (K, N) intermediate lives only in VMEM/registers.
HBM traffic drops to one read of the features + one write of the final
(G, K, N) similarity.

Numerics match the jnp path exactly in structure:
- the box mask is factored out of the dots ((p . f*m) == (p . f)*m and
  sum(w*m . f) == (w*m) @ f exactly, m in {0,1}),
- cosine denominators keep the reference's num / (max(na,eps) *
  max(nb,eps)) shape (`F.cosine_similarity` semantics, eps 1e-8),
- the hard assignment reproduces torch argmax's first-max-wins ties via
  min-index-of-max,
- dot operands can be cast to ``matmul_dtype`` (the apex-O1-fp16
  analog on bf16 models) with f32 accumulation; everything else is f32.

Reference: ``cosine_shift_batch`` + ``update_density_batch``
(`stdroi_point_deform_attn_reppoints.py:830-854,882-908`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU compiler knobs (absent on pure-CPU jax builds)
    from jax.experimental.pallas import tpu as pltpu

    _COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
except Exception:  # pragma: no cover
    _COMPILER_PARAMS = None

__all__ = ["cosine_shift_fixpoint"]


def _kernel(prot_ref, mask_ref, ft_ref, f_ref, nb_ref, out_prot_ref, out_sim_ref,
            *, n_shift, tau0, temp, mm):
    k, d = prot_ref.shape[1], prot_ref.shape[2]
    n = mask_ref.shape[2]
    mask = mask_ref[0, 0]  # (N,) f32 0/1
    nbase = nb_ref[0]  # (N,) raw feature norms
    nbm = jnp.maximum(nbase * mask, 1e-8)
    ft = ft_ref[...].astype(mm)  # (D, N)
    f = f_ref[...].astype(mm)  # (N, D)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (k, n), 0)

    def cos_feats(prot, denom_n):
        num = jax.lax.dot_general(
            prot.astype(mm), ft, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, N)
        na = jnp.maximum(
            jnp.sqrt(jnp.sum(prot * prot, axis=-1, keepdims=True)), 1e-8
        )  # (K, 1)
        return num * mask[None, :] / (na * denom_n[None, :])

    def body(_, carry):
        prot, tau = carry  # (K, D) f32, (K, 1) f32
        sim = cos_feats(prot, nbm)
        scaled = sim / (temp * tau)
        mx = jnp.max(scaled, axis=-1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(scaled - mx), axis=-1, keepdims=True)) + mx
        logw = scaled - lse
        weight = jnp.exp(logw)
        # torch argmax over K, first max wins: min index attaining the max
        colmax = jnp.max(logw, axis=0, keepdims=True)  # (1, N)
        idx = jnp.min(
            jnp.where(logw >= colmax, k_iota, k), axis=0, keepdims=True
        )  # (1, N)
        mask_w = (k_iota == idx).astype(jnp.float32)  # (K, N)
        wts = weight * mask_w * mask[None, :]
        prot = jax.lax.dot_general(
            wts.astype(mm), f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, D)
        sim2 = cos_feats(prot, nbm)
        cnt = mask_w.sum(-1)  # (K,)
        dens = (sim2 * mask_w).sum(-1)
        dens = 1.0 - jnp.where(cnt >= 1, dens / jnp.maximum(cnt, 1.0), 0.0)
        tau = jnp.maximum(dens, 1e-10)[:, None]
        return prot, tau

    prot0 = prot_ref[0].astype(jnp.float32)
    tau_init = jnp.full((k, 1), tau0, jnp.float32)
    prot, _ = jax.lax.fori_loop(0, n_shift, body, (prot0, tau_init))

    # final similarity against the UNMASKED features (feats_org)
    num = jax.lax.dot_general(
        prot.astype(mm), ft, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    na = jnp.maximum(jnp.sqrt(jnp.sum(prot * prot, axis=-1, keepdims=True)), 1e-8)
    out_sim_ref[0] = num / (na * jnp.maximum(nbase, 1e-8)[None, :])
    out_prot_ref[0] = prot


def cosine_shift_fixpoint(
    prototypes: jnp.ndarray,
    box_mask: jnp.ndarray,
    f: jnp.ndarray,
    tau: float = 0.1,
    temp: float = 0.1,
    n_shift: int = 10,
    matmul_dtype=None,
    interpret: bool = False,
):
    """Run the mean-shift fixpoint fully on-chip.

    Args:
        prototypes: (G, K, D) initial prototypes.
        box_mask: (G, N) {0,1} per-instance feature eligibility (the
            flattened ``box2mask`` output).
        f: (N, D) unmasked features (``feats_org``).

    Returns:
        prototypes (G, K, D) f32, sim (G, K, N) f32 — identical contract
        to ``cosine_shift_batch``.
    """
    g, k, d = prototypes.shape
    n = f.shape[0]
    mm = matmul_dtype or jnp.float32
    nbase = jnp.linalg.norm(f.astype(jnp.float32), axis=-1)  # (N,) raw
    out_prot, out_sim = pl.pallas_call(
        functools.partial(
            _kernel, n_shift=n_shift, tau0=float(tau), temp=float(temp), mm=mm
        ),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, k, d), lambda i: (i, 0, 0)),
            # mask rides a (G, 1, N) layout: a (1, N) block of a (G, N)
            # array violates Mosaic's trailing-dims rule (second-to-last
            # block dim must divide 8 or equal the array dim)
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, n), lambda i: (0, 0)),
            pl.BlockSpec((n, d), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, k, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, n), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, k, d), jnp.float32),
            jax.ShapeDtypeStruct((g, k, n), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(
        prototypes.astype(jnp.float32),
        box_mask.astype(jnp.float32)[:, None, :],
        f.astype(jnp.float32).T,
        f.astype(jnp.float32),
        nbase[None, :],
    )
    return out_prot, out_sim
