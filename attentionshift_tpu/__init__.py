"""attentionshift_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
point-supervised instance segmentation with the capabilities of
MingXiangL/AttentionShift (ICCV 2023).

The reference implementation is a vendored mmdetection v2.x + apex + CUDA
stack; this package is a from-scratch functional rebuild:

- ``ops``      low-level accelerator ops (roi_align, nms, point_sample,
               connected components, chamfer, resize, attention kernels)
- ``models``   ViT/Swin backbones, FPN, RPN, RoI heads (flax.linen)
- ``pseudo``   the attention-shift pseudo-label engine (rollout -> CAM ->
               box -> similarity refinement -> cosine mean-shift)
- ``core``     box toolbox: assigners, samplers, coders, losses, targets
- ``data``     VOC/COCO point datasets and jit-friendly input pipeline
- ``train``    TrainState, layer-decay AdamW, pjit train step, checkpoints
- ``eval``     VOC mask mAP (07 metric) and COCO-style evaluation
- ``parallel`` device-mesh / sharding helpers
"""

__version__ = "0.1.0"
