"""ViT detection backbone with point tokens and attention capture.

TPU-native rebuild of ``VisionTransformerDet``
(`mmdet/models/backbones/visual_transformer_det.py:61-275`):

- patchify + cls token + bicubic-interpolated learnable pos embed,
- 100 learnable "point tokens" with their own pos embeds appended after
  the patch tokens (`visual_transformer_det.py:192-214`),
- per-block head-averaged attention capture for the trailing
  ``capture_layers`` blocks (only those feed the rollout,
  `stdroi_point_deform_attn_reppoints.py:2261`) — the reference keeps all
  12 full maps; we keep just the needed window,
- feature taps at ``out_indices`` deconv/identity/maxpool-ed into a
  4-scale pyramid (`visual_transformer_det.py:106-134`),
- DETR-style MLP class/coord heads on the point tokens
  (`visual_transformer_det.py:264-267`).

Layout is channel-last (NHWC) throughout — the native TPU conv layout.
Per-block ``jax.checkpoint`` (remat) replaces torch checkpointing.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Block, Deconv2x2Matmul, PatchEmbed, interpolate_pos_embed

__all__ = ["VisionTransformerDet"]


class MlpHead(nn.Module):
    """3-layer relu MLP (`visual_transformer_det.py:26-38`)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layers_{i}")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype, name=f"layers_{self.num_layers - 1}")(x)


class VisionTransformerDet(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.05
    out_indices: Sequence[int] = (3, 5, 7, 11)
    point_tokens_num: int = 100
    num_classes: int = 20
    capture_layers: int = 7  # trailing blocks whose attention is kept
    with_fpn: bool = True
    with_point_head: bool = True
    use_remat: bool = True
    use_pallas_attention: bool = False
    # shard the token axis over the mesh's 'model' axis between blocks
    # (sequence parallelism): LN/residual/MLP segments hold only T/tp
    # tokens per chip, GSPMD gathers around the attention contractions.
    # The reference has no long-context story at all (SURVEY.md section
    # 5); this is the TPU-native scaling path for large images. Only
    # valid under jit inside a Mesh that has a 'model' axis.
    sequence_parallel: bool = False
    # Pad the token axis up to a multiple of this (0 = off) by inserting
    # zero tokens BETWEEN the patch and point tokens, masked out of every
    # softmax via the attention kernels' pad_interval. Point tokens stay
    # the last P rows and patch tokens stay rows [1, 1+n_patch], so every
    # downstream consumer (rollout, CAM slicing, feature taps) is
    # untouched. Purpose: at the bench shape T = 4301 -> 4352, the fused
    # kernels' per-block pad+slice copies (3 operand pads + out slice +
    # the 37 MB captured-map slice per capture block) all disappear —
    # the round-1/2 "pad the token axis" perf lever (NOTES_ROUND1.md).
    pad_tokens_to: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, deterministic: bool = True):
        """Forward.

        Args:
            img: (B, H, W, 3) normalised images, H/W divisible by 16.

        Returns:
            dict with the reference output contract (SURVEY.md section 3.3),
            channel-last:
              feature: 4-tuple (B, H/4, W/4, D) ... (B, H/32, W/32, D)
              org_feats: (B, 4, Hp, Wp, D) raw taps
              point_tokens: (B, P, D)
              outputs_class: (B, P, num_classes)
              outputs_coord: (B, P, 2) in [0,1]
              attns: (capture_layers, B, T, T) mean-head attention,
                     T = 1 + Hp*Wp + P, detached
              last_feat: (B, 1 + Hp*Wp, D) final tokens sans point tokens
        """
        b, h, w, _ = img.shape
        hp, wp = h // self.patch_size, w // self.patch_size
        n_patch = hp * wp
        p = self.point_tokens_num
        d = self.embed_dim

        x = PatchEmbed(d, self.patch_size, dtype=self.dtype, name="patch_embed")(img)
        x = x.reshape(b, n_patch, d)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        grid = self.img_size // self.patch_size
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, grid * grid + 1, d),
        )
        point_token = self.param(
            "point_token", nn.initializers.truncated_normal(0.02), (1, p, d)
        )
        point_pos_embed = self.param(
            "point_pos_embed", nn.initializers.truncated_normal(0.02), (1, p, d)
        )

        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, d)).astype(x.dtype), x], axis=1)
        pe = interpolate_pos_embed(pos_embed, hp, wp, num_prefix=1)
        x = x + pe.astype(x.dtype)
        pts = (point_token + point_pos_embed).astype(x.dtype)
        pad_interval = None
        if self.pad_tokens_to:
            t_real = 1 + n_patch + p
            n_pad = -t_real % self.pad_tokens_to
            if n_pad:
                pad_interval = (1 + n_patch, 1 + n_patch + n_pad)
                x = jnp.concatenate(
                    [x, jnp.zeros((b, n_pad, d), x.dtype)], axis=1
                )
        x = jnp.concatenate([x, jnp.broadcast_to(pts, (b, p, d))], axis=1)

        # numpy (not jnp): these are static hyperparams and must stay
        # concrete when the whole model is traced under an outer jax.jit
        dpr = np.linspace(0.0, self.drop_path_rate, self.depth).tolist()
        capture_from = self.depth - self.capture_layers

        def seq_shard(t):
            if not self.sequence_parallel:
                return t
            from jax.sharding import PartitionSpec as P

            from ..ops.attention import _current_mesh

            # no-op outside an active mesh with a 'model' axis (e.g. the
            # eager init the CLI runs before entering the mesh context)
            mesh = _current_mesh()
            if mesh is None or int(mesh.shape.get("model", 1)) <= 1:
                return t
            # batch stays on 'data' (None would mean REPLICATED and force
            # per-block all-gathers over the data axis), tokens on 'model'
            return jax.lax.with_sharding_constraint(t, P("data", "model", None))

        x = seq_shard(x)
        feats = []
        attns = []
        block_cls = nn.remat(Block) if self.use_remat else Block
        for i in range(self.depth):
            capture = i >= capture_from
            block = block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop_path=dpr[i],
                capture=capture,
                deterministic=deterministic,
                use_pallas=self.use_pallas_attention,
                pad_interval=pad_interval,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            x, attn = block(x)
            x = seq_shard(x)
            if capture:
                attns.append(attn)
            if i in self.out_indices:
                xp = x[:, 1 : 1 + n_patch].reshape(b, hp, wp, d)
                feats.append(xp)

        last_feat = x[:, : 1 + n_patch]
        point_tokens = x[:, x.shape[1] - p :]

        org_feats = jnp.stack(feats, axis=1)
        if self.with_fpn:
            feats = [
                self._fpn1(feats[0]),
                Deconv2x2Matmul(d, dtype=self.dtype, name="fpn2_deconv")(
                    feats[1]
                ),
                feats[2],
                nn.max_pool(feats[3], (2, 2), strides=(2, 2)),
            ]

        ret = dict(
            feature=tuple(feats),
            org_feats=org_feats,
            point_tokens=point_tokens,
            last_feat=last_feat,
            attns=jnp.stack(attns, axis=0) if attns else None,
        )
        if self.with_point_head:
            ret["outputs_class"] = MlpHead(d, self.num_classes, dtype=self.dtype, name="class_embed")(
                point_tokens
            )
            ret["outputs_coord"] = jax.nn.sigmoid(
                MlpHead(d, 2, dtype=self.dtype, name="bbox_embed")(point_tokens)
            )
        return ret

    def _fpn1(self, x):
        d = self.embed_dim
        x = Deconv2x2Matmul(d, dtype=self.dtype, name="fpn1_deconv1")(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="fpn1_bn"
        )(x)
        x = nn.gelu(x, approximate=False)
        x = Deconv2x2Matmul(d, dtype=self.dtype, name="fpn1_deconv2")(x)
        return x


def vit_forward_pp(
    model: VisionTransformerDet,
    variables,
    img,
    mesh,
    num_microbatches: int,
    axis: str = "model",
):
    """Pipeline-parallel backbone forward (GPipe over the block stack).

    TPU extension (the reference is DP-only, SURVEY.md section 2.11):
    the ``depth`` blocks are split into ``S = mesh.shape[axis]`` stages,
    one per mesh slice, and ``num_microbatches`` microbatches stream
    through the ``parallel.pp.gpipe_aux`` schedule. Per-block side
    outputs (captured attention, feature taps) land in stage-local
    buffers — they are never ppermuted around the ring.

    Constraints (documented, asserted):
    - deterministic forward only (drop-path off — stages must be
      homogeneous programs);
    - ``depth % S == 0`` and ``batch % num_microbatches == 0``;
    - every block runs in capture mode (stage homogeneity); only the
      trailing ``capture_layers`` maps are returned, matching the plain
      forward's contract.

    Returns the same output dict as ``model.apply(variables, img)``.
    """
    from ..parallel.pp import gpipe_aux, stack_stage_params

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    b, h, w, _ = img.shape
    d = model.embed_dim
    p = model.point_tokens_num
    hp, wp = h // model.patch_size, w // model.patch_size
    n_patch = hp * wp
    s = int(mesh.shape[axis])
    assert model.depth % s == 0, (model.depth, s)
    assert b % num_microbatches == 0, (b, num_microbatches)
    k = model.depth // s

    # ---- prologue (same math as __call__) ----
    x = PatchEmbed(d, model.patch_size, dtype=model.dtype).apply(
        {"params": params["patch_embed"]}, img
    ).reshape(b, n_patch, d)
    x = jnp.concatenate(
        [jnp.broadcast_to(params["cls_token"], (b, 1, d)).astype(x.dtype), x],
        axis=1,
    )
    pe = interpolate_pos_embed(params["pos_embed"], hp, wp, num_prefix=1)
    x = x + pe.astype(x.dtype)
    pts = (params["point_token"] + params["point_pos_embed"]).astype(x.dtype)
    pad_interval = None
    if model.pad_tokens_to:
        t_real = 1 + n_patch + p
        n_pad = -t_real % model.pad_tokens_to
        if n_pad:
            pad_interval = (1 + n_patch, 1 + n_patch + n_pad)
            x = jnp.concatenate([x, jnp.zeros((b, n_pad, d), x.dtype)], axis=1)
    x = jnp.concatenate([x, jnp.broadcast_to(pts, (b, p, d))], axis=1)
    t = x.shape[1]

    # ---- staged trunk ----
    stacked = stack_stage_params([
        stack_stage_params([params[f"blocks_{si * k + j}"] for j in range(k)])
        for si in range(s)
    ])  # leaves: (S, k, ...)
    block = Block(
        num_heads=model.num_heads, mlp_ratio=model.mlp_ratio,
        qkv_bias=model.qkv_bias, drop_path=0.0, capture=True,
        deterministic=True, use_pallas=model.use_pallas_attention,
        pad_interval=pad_interval, dtype=model.dtype,
    )

    def stage_fn(pstage, mb):
        def body(xc, pblk):
            y, attn = block.apply({"params": pblk}, xc)
            return y, (attn.astype(xc.dtype), y)

        xout, aux = jax.lax.scan(body, mb, pstage)
        return xout, aux

    m = num_microbatches
    mb = b // m
    xm = x.reshape(m, mb, t, d)
    aux_shape = (
        jax.ShapeDtypeStruct((k, mb, t, t), x.dtype),
        jax.ShapeDtypeStruct((k, mb, t, d), x.dtype),
    )
    out, (attns_sm, xs_sm) = gpipe_aux(
        stage_fn, stacked, xm, aux_shape, mesh=mesh, axis=axis
    )
    x_final = out.reshape(b, t, d)
    # (S, M, k, mb, ...) -> (depth, B, ...)
    attns_all = attns_sm.transpose(0, 2, 1, 3, 4, 5).reshape(model.depth, b, t, t)
    xs_all = xs_sm.transpose(0, 2, 1, 3, 4, 5).reshape(model.depth, b, t, d)

    # ---- epilogue (same math as __call__) ----
    feats = [
        xs_all[i][:, 1 : 1 + n_patch].reshape(b, hp, wp, d)
        for i in model.out_indices
    ]
    org_feats = jnp.stack(feats, axis=1)
    if model.with_fpn:
        f0 = Deconv2x2Matmul(d, dtype=model.dtype).apply(
            {"params": params["fpn1_deconv1"]}, feats[0])
        f0 = nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=model.dtype
        ).apply({"params": params["fpn1_bn"],
                 "batch_stats": bstats["fpn1_bn"]}, f0)
        f0 = nn.gelu(f0, approximate=False)
        f0 = Deconv2x2Matmul(d, dtype=model.dtype).apply(
            {"params": params["fpn1_deconv2"]}, f0)
        feats = [
            f0,
            Deconv2x2Matmul(d, dtype=model.dtype).apply(
                {"params": params["fpn2_deconv"]}, feats[1]),
            feats[2],
            nn.max_pool(feats[3], (2, 2), strides=(2, 2)),
        ]

    last_feat = x_final[:, : 1 + n_patch]
    point_tokens = x_final[:, t - p :]
    capture_from = model.depth - model.capture_layers
    ret = dict(
        feature=tuple(feats),
        org_feats=org_feats,
        point_tokens=point_tokens,
        last_feat=last_feat,
        attns=attns_all[capture_from:],
    )
    if model.with_point_head:
        ret["outputs_class"] = MlpHead(d, model.num_classes, dtype=model.dtype).apply(
            {"params": params["class_embed"]}, point_tokens)
        ret["outputs_coord"] = jax.nn.sigmoid(
            MlpHead(d, 2, dtype=model.dtype).apply(
                {"params": params["bbox_embed"]}, point_tokens))
    return ret
