"""Mask R-CNN refinement detector (models/mask_rcnn.py, models/resnet.py).

Covers the AttnShift-dagger capability: a stock Mask R-CNN retrained on
pseudo labels (reference: vendored mmdet zoo `mmdet/models/detectors/
mask_rcnn.py` + `figures/Perform-VOC.jpg` dagger rows).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-detector / subprocess tests

from attentionshift_tpu.models.mask_rcnn import MaskRCNN
from attentionshift_tpu.models.resnet import ResNet

H = W = 128
MS = 4
G = 4


def _model():
    return MaskRCNN(
        num_classes=5, num_proposals=50, rpn_nms_pre=100,
        rcnn_samples=32, mask_sample_cap=8, mask_stride=MS,
        depths=(1, 1, 1, 1), test_max_per_img=10,
    )


def _batch(rng):
    img = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
    boxes = jnp.asarray([[[8, 8, 60, 70], [50, 40, 120, 100], [0, 0, 30, 30], [0, 0, 0, 0]]], jnp.float32)
    labels = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    valid = jnp.asarray([[True, True, True, False]])
    masks = np.zeros((1, G, H // MS, W // MS), np.uint8)
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(boxes[0], int)):
        masks[0, i, y1 // MS : y2 // MS, x1 // MS : x2 // MS] = 1
    wh = jnp.asarray([[float(W), float(H)]])
    return img, boxes, labels, jnp.asarray(masks), valid, wh


def test_resnet_pyramid_shapes():
    m = ResNet(depths=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 256), (1, 8, 12, 512), (1, 4, 6, 1024), (1, 2, 3, 2048),
    ]


def test_resnet_frozen_stages_zero_grads():
    m = ResNet(depths=(1, 1, 1, 1), frozen_stages=1)
    x = jnp.ones((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return sum(o.sum() for o in m.apply(p, x))

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        name = "/".join(str(k.key) for k in path if hasattr(k, "key"))
        gn = float(jnp.abs(g).sum())
        if "conv1" == name.split("/")[1] or "/bn1/" in f"/{name}/" or "layer1_" in name:
            assert gn == 0.0, f"{name} should be frozen"
        elif "layer4" in name and "conv" in name:
            assert gn > 0.0, f"{name} should train"


def test_mask_rcnn_train_losses_finite_and_flow():
    model = _model()
    rng = np.random.RandomState(0)
    img, boxes, labels, masks, valid, wh = _batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        img, boxes, labels, masks, valid, wh,
    )

    @jax.jit
    def loss_fn(p):
        losses, _ = model.apply(
            p, img, boxes, labels, masks, valid, wh,
            rngs={"sampling": jax.random.PRNGKey(2)},
        )
        return sum(v for k, v in losses.items() if k.startswith("loss")), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox", "loss_mask"} <= set(losses)
    # gradients reach all heads + unfrozen backbone
    for mod in ["bbox_head", "mask_head", "rpn_head", "neck"]:
        gsum = sum(
            float(jnp.abs(g).sum())
            for g in jax.tree_util.tree_leaves(grads["params"][mod])
        )
        assert gsum > 0, mod


def test_mask_rcnn_simple_test_shapes():
    model = _model()
    rng = np.random.RandomState(0)
    img, boxes, labels, masks, valid, wh = _batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        img, boxes, labels, masks, valid, wh,
    )
    out = jax.jit(
        lambda p: model.apply(p, img, wh, method=MaskRCNN.simple_test)
    )(params)
    assert out.dets.boxes.shape == (1, 10, 4)
    assert out.mask_probs.shape == (1, 10, 28, 28)
    assert np.isfinite(np.asarray(out.mask_probs)).all()
    b = np.asarray(out.dets.boxes)
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()


def test_mask_target_crop_semantics():
    """A roi exactly covering a gt mask -> all-ones 28x28 target."""
    from attentionshift_tpu.ops.roi_align import roi_align

    m = np.zeros((1, 1, 32, 32), np.float32)
    m[0, 0, 4:24, 8:28] = 1.0
    rois = jnp.asarray([[0, 8.0, 4.0, 28.0, 24.0]])  # already in mask units
    crop = roi_align(jnp.asarray(m), rois, 1.0, output_size=28, sampling_ratio=2)
    inner = np.asarray(crop[0, 0, 2:-2, 2:-2])
    assert (inner > 0.9).all()


def test_mask_rcnn_overfits_single_box():
    """Few steps of adam reduce total loss on one fixed batch."""
    import optax

    model = _model()
    rng = np.random.RandomState(0)
    img, boxes, labels, masks, valid, wh = _batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        img, boxes, labels, masks, valid, wh,
    )
    tx = optax.adam(2e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, key):
        def loss_fn(pp):
            losses, _ = model.apply(
                pp, img, boxes, labels, masks, valid, wh, rngs={"sampling": key}
            )
            return sum(v for k, v in losses.items() if k.startswith("loss"))

        l, g = jax.value_and_grad(loss_fn)(p)
        up, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, up), o2, l

    first = None
    key = jax.random.PRNGKey(5)
    last3 = []
    for i in range(25):
        params, opt, l = step(params, opt, key)  # fixed rng: same sampling
        if first is None:
            first = float(l)
        last3 = (last3 + [float(l)])[-3:]
    assert sum(last3) / 3 < first * 0.5, (first, last3)


# ---------------------------------------------------------------- refine data

def test_refine_dataset_and_pipeline(tmp_path):
    """InstanceCocoDataset (RLE + polygon) -> RefineTrainPipeline batch."""
    import json as _json

    from PIL import Image as PILImage

    from attentionshift_tpu.data.refine import InstanceCocoDataset, RefineTrainPipeline
    from attentionshift_tpu.native import rle_encode, rle_to_string

    root = tmp_path
    (root / "imgs").mkdir()
    h, w = 96, 128
    rng = np.random.RandomState(0)
    PILImage.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
        root / "imgs" / "0.jpg"
    )
    m = np.zeros((h, w), np.uint8)
    m[20:60, 30:90] = 1
    rle = rle_encode(m)
    ann_rle = dict(
        id=1, image_id=0, category_id=1, bbox=[30, 20, 60, 40],
        segmentation=dict(size=[h, w], counts=rle_to_string(rle).decode("ascii")),
        iscrowd=0,
    )
    ann_poly = dict(
        id=2, image_id=0, category_id=2, bbox=[10, 10, 30, 30],
        segmentation=[[10, 10, 40, 10, 40, 40, 10, 40]], iscrowd=0,
    )
    (root / "ann.json").write_text(_json.dumps(dict(
        images=[dict(id=0, file_name="0.jpg", width=w, height=h)],
        annotations=[ann_rle, ann_poly],
        categories=[dict(id=1, name="a"), dict(id=2, name="b")],
    )))

    ds = InstanceCocoDataset(str(root / "ann.json"), str(root / "imgs"))
    s = ds[0]
    assert s["masks"].shape == (2, h, w)
    assert s["masks"][0].sum() == m.sum()  # RLE roundtrip exact
    assert s["masks"][1].sum() > 0  # polygon rasterised

    pipe = RefineTrainPipeline(scales=[(96, 160)], max_gt=4, mask_stride=4,
                               flip_ratio=1.0)
    out = pipe(s, np.random.RandomState(0))
    assert out["img"].shape[2] == 3
    assert out["gt_masks"].shape == (4, out["img"].shape[0] // 4,
                                     out["img"].shape[1] // 4)
    assert out["gt_valid"][:2].all() and not out["gt_valid"][2:].any()
    # flipped box must still bound the flipped mask (at stride tolerance)
    bx = out["gt_boxes"][0] / 4
    ys, xs = np.nonzero(out["gt_masks"][0])
    assert xs.min() >= bx[0] - 2 and xs.max() <= bx[2] + 2
    assert ys.min() >= bx[1] - 2 and ys.max() <= bx[3] + 2


def test_refine_cli_end_to_end(tmp_path):
    """gen_pseudo_labels -> mrcnn refine train -> eval, all via CLIs."""
    import json as _json
    import subprocess
    import sys as _sys

    from PIL import Image as PILImage

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tmp_path / "VOC"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationObject").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.RandomState(0)
    palette = []
    for i in range(256):
        palette += [i, (i * 37) % 256, (i * 91) % 256]
    images, annotations, val_ids = [], [], []
    for i in range(2):
        h, w = 96, 128
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"2012_{i:06d}"
        PILImage.fromarray(arr).save(root / "JPEGImages" / f"{name}.jpg")
        images.append(dict(id=i, file_name=f"{name}.jpg", width=w, height=h))
        annotations.append(dict(id=i, image_id=i, category_id=1 + i,
                                point=[w * 0.5, h * 0.5]))
        obj = np.zeros((h, w), np.uint8)
        obj[h // 4 : h // 2, w // 4 : w // 2] = 1
        cls = np.zeros((h, w), np.uint8)
        cls[obj == 1] = 1 + i
        for sub, a in (("SegmentationObject", obj), ("SegmentationClass", cls)):
            im = PILImage.fromarray(a, mode="P")
            im.putpalette(palette)
            im.save(root / sub / f"{name}.png")
        val_ids.append(name)
    cats = [dict(id=1, name="aeroplane"), dict(id=2, name="bicycle")]
    (root / "train.json").write_text(_json.dumps(dict(
        images=images, annotations=annotations, categories=cats)))
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(val_ids) + "\n")

    seed_cfg = tmp_path / "seed.py"
    seed_cfg.write_text(f"""
model = dict(num_classes=20, embed_dim=48, depth=4, num_heads=6,
             out_indices=(0, 1, 2, 3), img_size=64, point_tokens=10,
             cam_layer=3, use_remat=False, max_gt=4, cam_stride=4,
             ccl_iters=8, num_mask_point_gt=4, corr_size=3,
             mean_shift_times=2, num_semantic_points=2, rpn_channels=16,
             num_proposals=16, rpn_nms_pre=16, rcnn_samples=8,
             mask_sample_cap=4, test_max_per_img=5)
data = dict(
    train=dict(ann_file={str(root / 'train.json')!r},
               img_prefix={str(root / 'JPEGImages')!r}, repeat=1),
    batch_size=1, num_threads=1, max_gt=4, flip_ratio=0.5,
    train_scales=[(96, 160)], test_scale=(96, 160),
)
optimizer = dict(base_lr=1e-4, weight_decay=0.05, layer_decay=0.75,
                 accumulate_steps=1, grad_clip=None)
schedule = dict(total_epochs=1, decay_epochs=[8], warmup_iters=5,
                warmup_ratio=1e-3)
runtime = dict(log_interval=1, checkpoint_interval=1, eval_interval=1,
               seed=0, loss_weight_start_epoch=-1)
""")
    env = dict(os.environ)
    env["ATTNSHIFT_PLATFORM"] = "cpu"
    pseudo = tmp_path / "pseudo.json"
    r = subprocess.run(
        [_sys.executable, "tools/gen_pseudo_labels.py", str(seed_cfg),
         "--out", str(pseudo), "--scale", "96", "160"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    dumped = _json.loads(pseudo.read_text())
    assert len(dumped["images"]) == 2 and len(dumped["annotations"]) >= 1
    for ann in dumped["annotations"]:
        assert isinstance(ann["segmentation"]["counts"], str)

    refine_cfg = tmp_path / "refine.py"
    refine_cfg.write_text(f"""
model_type = "mask_rcnn"
model = dict(num_classes=20, rpn_channels=16, num_proposals=16,
             rpn_nms_pre=16, rcnn_samples=8, mask_sample_cap=4,
             mask_stride=4, depths=(1, 1, 1, 1), frozen_stages=0,
             test_max_per_img=5)
data = dict(
    train=dict(type="InstanceCocoDataset", ann_file={str(pseudo)!r},
               img_prefix={str(root / 'JPEGImages')!r}, repeat=1),
    val=dict(split_file={str(root / 'ImageSets' / 'Segmentation' / 'val.txt')!r},
             voc_root={str(root)!r}),
    batch_size=1, num_threads=1, max_gt=4, flip_ratio=0.5,
    train_scales=[(96, 160)], test_scale=(96, 160),
)
optimizer = dict(base_lr=1e-3, momentum=0.9, weight_decay=1e-4,
                 accumulate_steps=1, grad_clip=None)
schedule = dict(total_epochs=1, decay_epochs=[8], warmup_iters=5,
                warmup_ratio=1e-3)
runtime = dict(log_interval=1, checkpoint_interval=1, eval_interval=1,
               seed=0, loss_weight_start_epoch=-1)
""")
    work = str(tmp_path / "work")
    r2 = subprocess.run(
        [_sys.executable, "tools/train.py", str(refine_cfg), "--work-dir", work,
         "--max-steps", "2", "--validate-limit", "1"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=560,
    )
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "training done" in r2.stdout
    assert os.path.isdir(os.path.join(work, "epoch_1"))

    r3 = subprocess.run(
        [_sys.executable, "tools/test.py", str(refine_cfg),
         os.path.join(work, "epoch_1"), "--limit", "1"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=560,
    )
    assert r3.returncode == 0, r3.stdout[-2000:] + r3.stderr[-2000:]
    out = _json.loads(r3.stdout.strip().splitlines()[-1])
    assert set(out) == {"mAP@0.25", "mAP@0.5", "mAP@0.75"}


def test_mask_rcnn_aug_test_stages():
    """AugTester drives MaskRCNN through the same stage contract."""
    from attentionshift_tpu.eval.aug_test import AugTester

    model = _model()
    rng = np.random.RandomState(0)
    img, boxes, labels, masks, valid, wh = _batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        img, boxes, labels, masks, valid, wh,
    )
    tester = AugTester(model, params, scales=[(96, 128)], flip=True)
    raw = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    out = tester(raw, max_dets=6)
    assert out["boxes"].shape == (6, 4)
    assert out["mask_probs"].shape == (6, 28, 28)
    assert np.isfinite(out["mask_probs"]).all()
    b = out["boxes"]
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
    assert (b[:, [0, 2]] <= W).all() and (b[:, [1, 3]] <= H).all()


def test_faster_rcnn_variant_no_mask_head():
    """with_mask=False (plain Faster R-CNN): no mask params, full-box
    probs from both simple_test and the aug-test mask stage."""
    model = MaskRCNN(
        num_classes=5, num_proposals=20, rpn_nms_pre=40, rcnn_samples=16,
        mask_sample_cap=4, depths=(1, 1, 1, 1), test_max_per_img=6,
        with_mask=False,
    )
    rng = np.random.RandomState(0)
    img, boxes, labels, masks, valid, wh = _batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        img, boxes, labels, masks, valid, wh,
    )
    assert "mask_head" not in params["params"]
    losses, _ = model.apply(
        p := params, img, boxes, labels, masks, valid, wh,
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    assert "loss_mask" not in losses
    out = model.apply(p, img, wh, method=MaskRCNN.simple_test)
    assert (np.asarray(out.mask_probs) == 1.0).all()
    rois = out.dets.boxes
    m = model.apply(p, img, rois, out.dets.labels, method=MaskRCNN.mask_test)
    assert (np.asarray(m) == 1.0).all()


def test_sgd_frozen_stage_weight_decay_excluded():
    """Frozen ResNet stem/layer1 kernels get NO weight decay (their
    grads are already zero via stop_gradient)."""
    import optax

    from attentionshift_tpu.train.optim import build_sgd_optimizer

    model = ResNet(depths=(1, 1, 1, 1), frozen_stages=1)
    x = jnp.ones((1, 64, 64, 3))
    inner = model.init(jax.random.PRNGKey(0), x)
    params = {"params": {"backbone": inner["params"]}}
    tx = build_sgd_optimizer(
        params, base_lr=1.0, momentum=0.0, weight_decay=0.1,
        steps_per_epoch=10, warmup_iters=0, frozen_stages=1,
    )
    opt = tx.init(params)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_g, opt, params)
    upd = updates["params"]["backbone"]
    assert float(jnp.abs(upd["conv1"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(upd["layer1_0"]["conv1"]["kernel"]).sum()) == 0.0
    # trainable stages DO decay
    assert float(jnp.abs(upd["layer4_0"]["conv1"]["kernel"]).sum()) > 0.0
