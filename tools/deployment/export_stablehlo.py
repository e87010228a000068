"""Export the inference graph as serialized StableHLO for serving.

The TPU-native counterpart of the reference's deployment exporters
(`tools/deployment/pytorch2onnx.py`, `onnx2tensorrt.py`): instead of
ONNX, the portable serving format of the JAX/XLA stack is **StableHLO**
via ``jax.export`` — loadable from any XLA runtime (TF serving through
``tf.XlaCallModule``, IREE, PJRT C API) with no Python or flax at serve
time.

Exports ``AttnShiftDetector.simple_test`` (or the Mask R-CNN refinement
model) at a fixed serving resolution, with the checkpoint's weights
baked in as constants (``--weights-as-args`` keeps them as runtime
arguments instead, for weight-swappable deployments).

    python tools/deployment/export_stablehlo.py configs/attnshift_voc12aug.py \
        work_dirs/voc/epoch_12 --out detector.stablehlo [--scale 800 1344]

Round-trip check: the tool re-imports the artifact with
``jax.export.deserialize`` and compares outputs against the live model
on a random image before writing.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", type=int, nargs=2, default=None,
                    metavar=("H", "W"), help="serving resolution "
                    "(default: the config's test bucket)")
    ap.add_argument("--weights-as-args", action="store_true",
                    help="export weights as runtime arguments instead of "
                         "baked-in constants")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    from attentionshift_tpu.config import Config
    from attentionshift_tpu.core.postprocess import Detections
    from attentionshift_tpu.data.pipeline import TestPipeline
    from attentionshift_tpu.models.detector import AttnShiftDetector, TestOutputs

    # the inference outputs are namedtuples; teach the serializer their
    # structure so the artifact round-trips the full pytree
    for nt in (Detections, TestOutputs):
        jax.export.register_namedtuple_serialization(
            nt, serialized_name=f"attentionshift_tpu.{nt.__name__}"
        )

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    refine = cfg.get("model_type", "attnshift") == "mask_rcnn"
    if refine:
        from attentionshift_tpu.models.mask_rcnn import MaskRCNN

        model = MaskRCNN(**cfg.model.to_dict())
    else:
        model = AttnShiftDetector(**cfg.model.to_dict())

    if args.scale:
        bh, bw = args.scale
    else:
        bh, bw = TestPipeline(scale=tuple(cfg.data.test_scale)).bucket_hw
    print(f"serving resolution: {bh}x{bw}")

    rng = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, bh, bw, 3), jnp.float32)
    wh0 = jnp.asarray([[float(bw), float(bh)]], jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, img0, wh0, method=type(model).simple_test)
    )(rng)
    if args.checkpoint:
        # params-only restore from a TRAIN checkpoint (superset of the
        # test params), independent of the training optimizer layout
        from attentionshift_tpu.train import restore_params

        params = restore_params(args.checkpoint)
        print(f"loaded {args.checkpoint}")

    def serve_with_params(p, img, img_wh):
        return model.apply(p, img, img_wh, method=type(model).simple_test)

    if args.weights_as_args:
        fn = jax.jit(serve_with_params)
        exp_args = (params, img0, wh0)
    else:
        fn = jax.jit(lambda img, img_wh: serve_with_params(params, img, img_wh))
        exp_args = (img0, wh0)

    exported = jax.export.export(fn)(*exp_args)
    blob = exported.serialize()

    if not args.skip_check:
        re = jax.export.deserialize(blob)
        x = jnp.asarray(np.random.RandomState(0).randn(1, bh, bw, 3), jnp.float32)
        check_args = (params, x, wh0) if args.weights_as_args else (x, wh0)
        a = jax.tree.map(np.asarray, fn(*check_args))
        b = jax.tree.map(np.asarray, re.call(*check_args))
        jax.tree.map(
            lambda u, v: np.testing.assert_allclose(u, v, rtol=1e-5, atol=1e-5),
            a, b,
        )
        print("round-trip check OK")

    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"StableHLO version {exported.calling_convention_version})")


if __name__ == "__main__":
    main()
