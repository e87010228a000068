"""Torch MAE checkpoint -> flax parameter conversion.

Replaces the reference's ``load_checkpoint(strict=False)`` MAE-pretrain
init (`mmcv_custom/checkpoint.py:286-358`, key filtering at
`mae_bbox_head_rec.py:107-116`): torch ``state_dict`` tensors are mapped
onto the flax ``VisionTransformerDet`` tree, with bicubic pos-embed
re-interpolation when the stored grid differs. Keys that have no flax
counterpart (decoder/point heads not present in the pretrain) are left at
their random init, mirroring strict=False.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "resolve_checkpoint_path",
    "mae_to_vit_params",
    "torchvision_resnet_params",
]


def resolve_checkpoint_path(
    path: str, cache_dir: str | None = None, sha256: str | None = None
) -> str:
    """Resolve a checkpoint spec to a local file path.

    The reference's ``_load_checkpoint`` dispatches on URL scheme
    (`mmcv_custom/checkpoint.py:286-358`): plain paths load directly,
    ``http(s)://`` URLs download into a torch-hub-style cache, and
    pavi/s3 go through proprietary clients. This mirrors the url
    semantics: ``http(s)://`` and ``file://`` URLs are fetched once into
    ``cache_dir`` (default ``~/.cache/attentionshift_tpu/checkpoints``,
    override with $ATTNSHIFT_CKPT_CACHE) and reused on later calls;
    everything else must be a local path. pavi:// and s3:// raise with
    the reason (no proprietary clients here).

    Cache entries are keyed by ``<sha256(full URL)[:16]>-<basename>``
    (not basename alone), so two URLs sharing a filename never collide
    (ADVICE r4). ``sha256``, when given, is verified against the cached
    file's digest; a mismatch deletes the entry and raises.
    """
    import hashlib
    import urllib.parse
    import urllib.request

    scheme = urllib.parse.urlparse(path).scheme
    if scheme in ("", None) or len(scheme) <= 1:  # plain / drive-letter path
        return path
    if scheme in ("pavi", "s3"):
        raise NotImplementedError(
            f"{scheme}:// checkpoint backends need proprietary clients "
            "(reference: mmcv_custom/checkpoint.py:300-338); download the "
            "file and pass a local or http(s):// path instead"
        )
    if scheme not in ("http", "https", "file"):
        raise ValueError(f"unsupported checkpoint URL scheme: {path}")
    import os

    cache_dir = (
        cache_dir
        or os.environ.get("ATTNSHIFT_CKPT_CACHE")
        or os.path.expanduser("~/.cache/attentionshift_tpu/checkpoints")
    )
    os.makedirs(cache_dir, exist_ok=True)
    fname = os.path.basename(urllib.parse.urlparse(path).path) or "checkpoint.pth"
    url_key = hashlib.sha256(path.encode()).hexdigest()[:16]
    dst = os.path.join(cache_dir, f"{url_key}-{fname}")
    if not os.path.exists(dst):
        tmp = dst + ".part"
        urllib.request.urlretrieve(path, tmp)
        os.replace(tmp, dst)
    if sha256 is not None:
        h = hashlib.sha256()
        with open(dst, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != sha256:
            os.remove(dst)
            raise ValueError(
                f"checkpoint {path}: sha256 mismatch "
                f"(got {h.hexdigest()}, want {sha256}); cached copy removed"
            )
    return dst


def load_torch_state_dict(path: str, sha256: str | None = None) -> Dict[str, np.ndarray]:
    """Load a torch .pth checkpoint (local path or url) into
    {key: np.ndarray} on host.

    ``weights_only=True`` first (no unpickle code execution — most MAE /
    torchvision checkpoints are plain tensor dicts); legacy pickles that
    need full unpickling fall back with a warning.
    """
    import torch

    path = resolve_checkpoint_path(path, sha256=sha256)
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # legacy pickle (e.g. argparse.Namespace in meta)
        import warnings

        warnings.warn(
            f"{path}: not loadable with weights_only=True; falling back to "
            "full unpickling — only load checkpoints you trust",
            stacklevel=2,
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    return {k: v.detach().numpy() for k, v in ckpt.items() if hasattr(v, "detach")}


def _set(tree: Dict[str, Any], path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def mae_to_vit_params(
    state: Mapping[str, np.ndarray],
    params: Dict[str, Any],
    depth: int = 12,
) -> Dict[str, Any]:
    """Graft MAE encoder weights onto a VisionTransformerDet param tree.

    Args:
        state: torch state_dict arrays (encoder naming: ``patch_embed.proj``,
            ``cls_token``, ``pos_embed``, ``blocks.N.{norm1,attn,norm2,mlp}``).
        params: the flax 'params' dict from ``model.init`` (modified copy
            returned; input is not mutated).

    Returns:
        new params dict with loaded weights (float32).
    """
    import copy

    out = copy.deepcopy(params)

    def linear(src_prefix: str, dst_path: list[str]):
        w = state.get(f"{src_prefix}.weight")
        b = state.get(f"{src_prefix}.bias")
        if w is not None:
            _set(out, dst_path + ["kernel"], np.ascontiguousarray(w.T.astype(np.float32)))
        if b is not None:
            _set(out, dst_path + ["bias"], b.astype(np.float32))

    def layernorm(src_prefix: str, dst_path: list[str]):
        w = state.get(f"{src_prefix}.weight")
        b = state.get(f"{src_prefix}.bias")
        if w is not None:
            _set(out, dst_path + ["scale"], w.astype(np.float32))
        if b is not None:
            _set(out, dst_path + ["bias"], b.astype(np.float32))

    if "patch_embed.proj.weight" in state:
        w = state["patch_embed.proj.weight"]  # (D, 3, k, k)
        _set(
            out,
            ["patch_embed", "proj", "kernel"],
            np.ascontiguousarray(w.transpose(2, 3, 1, 0).astype(np.float32)),
        )
        _set(out, ["patch_embed", "proj", "bias"], state["patch_embed.proj.bias"].astype(np.float32))
    if "cls_token" in state:
        out["cls_token"] = state["cls_token"].astype(np.float32)
    if "pos_embed" in state and "pos_embed" in out:
        pe = state["pos_embed"].astype(np.float32)  # (1, N+1, D)
        tgt = out["pos_embed"]
        if pe.shape != tgt.shape:
            pe = _resize_pos_embed(pe, tgt.shape)
        out["pos_embed"] = pe

    for i in range(depth):
        src = f"blocks.{i}"
        dst = f"blocks_{i}"
        if f"{src}.norm1.weight" not in state:
            continue
        layernorm(f"{src}.norm1", [dst, "norm1"])
        layernorm(f"{src}.norm2", [dst, "norm2"])
        linear(f"{src}.attn.qkv", [dst, "attn", "qkv"])
        linear(f"{src}.attn.proj", [dst, "attn", "proj"])
        linear(f"{src}.mlp.fc1", [dst, "mlp", "fc1"])
        linear(f"{src}.mlp.fc2", [dst, "mlp", "fc2"])
    return out


def _resize_pos_embed(pe: np.ndarray, tgt_shape) -> np.ndarray:
    """Bicubic-resize a (1, N+1, D) pos embed to a new grid size."""
    import jax.numpy as jnp

    from ..models.layers import interpolate_pos_embed

    n_tgt = tgt_shape[1] - 1
    side = int(round(float(np.sqrt(n_tgt))))
    res = interpolate_pos_embed(jnp.asarray(pe), side, side, num_prefix=1)
    return np.asarray(res, dtype=np.float32)


def mae_to_decoder_params(
    state: Mapping[str, np.ndarray],
    params: Dict[str, Any],
    depth: int = 4,
) -> Dict[str, Any]:
    """Graft MAE *decoder* weights onto a decoder-style RoI head tree.

    The reference heads load every checkpoint key except
    ``patch_embed*/blocks*/pos_embed`` (`mae_bbox_head_rec.py:107-116`) so
    ``decoder_embed``, ``decoder_blocks.N.*`` and ``norm`` land in the
    head. Same mapping here for heads exposing ``decoder_blocks_N``.
    """
    import copy

    out = copy.deepcopy(params)

    def linear(src_prefix, dst_path):
        w = state.get(f"{src_prefix}.weight")
        b = state.get(f"{src_prefix}.bias")
        if w is not None and _has(out, dst_path):
            _set(out, dst_path + ["kernel"], np.ascontiguousarray(w.T.astype(np.float32)))
            if b is not None:
                _set(out, dst_path + ["bias"], b.astype(np.float32))

    def layernorm(src_prefix, dst_path):
        w = state.get(f"{src_prefix}.weight")
        b = state.get(f"{src_prefix}.bias")
        if w is not None and _has(out, dst_path):
            _set(out, dst_path + ["scale"], w.astype(np.float32))
            _set(out, dst_path + ["bias"], b.astype(np.float32))

    def _has(tree, path):
        node = tree
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        return True

    linear("decoder_embed", ["decoder_embed"])
    layernorm("norm", ["norm"])
    for i in range(depth):
        src = f"decoder_blocks.{i}"
        dst = f"decoder_blocks_{i}"
        layernorm(f"{src}.norm1", [dst, "norm1"])
        layernorm(f"{src}.norm2", [dst, "norm2"])
        linear(f"{src}.attn.qkv", [dst, "attn", "qkv"])
        linear(f"{src}.attn.proj", [dst, "attn", "proj"])
        linear(f"{src}.mlp.fc1", [dst, "mlp", "fc1"])
        linear(f"{src}.mlp.fc2", [dst, "mlp", "fc2"])
    return out


def torchvision_resnet_params(
    state: Mapping[str, np.ndarray],
    params: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a torchvision ResNet state_dict onto ``models.resnet.ResNet``.

    BatchNorm running statistics land in the ``FrozenBN`` constants
    (mmdet ``norm_eval=True`` semantics). The classifier ``fc.*`` is
    dropped. Missing keys keep their random init (strict=False).
    """
    import copy

    out = copy.deepcopy(params)

    def conv(src: str, path: list[str]) -> None:
        w = state.get(f"{src}.weight")
        if w is not None:
            _set(out, path + ["kernel"], np.transpose(w, (2, 3, 1, 0)))

    def bn(src: str, path: list[str]) -> None:
        pairs = [
            ("weight", "scale"), ("bias", "bias"),
            ("running_mean", "mean"), ("running_var", "var"),
        ]
        for tk, fk in pairs:
            v = state.get(f"{src}.{tk}")
            if v is not None:
                _set(out, path + [fk], np.asarray(v))

    conv("conv1", ["conv1"])
    bn("bn1", ["bn1"])
    # stage block counts come from the flax tree itself
    names = [k for k in params if k.startswith("layer")]
    for name in names:
        stage, blk = name.replace("layer", "").split("_")
        src = f"layer{stage}.{blk}"
        for c in ("1", "2", "3"):
            conv(f"{src}.conv{c}", [name, f"conv{c}"])
            bn(f"{src}.bn{c}", [name, f"bn{c}"])
        if "downsample_conv" in params[name]:
            conv(f"{src}.downsample.0", [name, "downsample_conv"])
            bn(f"{src}.downsample.1", [name, "downsample_bn"])
    return out
