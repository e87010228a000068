"""End-to-end CLI smoke: train 2 steps + auto-resume + eval on synthetic VOC."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-detector / subprocess tests
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_MODEL = dict(
    num_classes=20, embed_dim=48, depth=4, num_heads=6, out_indices=(0, 1, 2, 3),
    img_size=64, point_tokens=10, cam_layer=3, use_remat=False, max_gt=4,
    cam_stride=4, ccl_iters=8, num_mask_point_gt=4, corr_size=3,
    mean_shift_times=2, num_semantic_points=2, rpn_channels=16,
    num_proposals=16, rpn_nms_pre=16, rcnn_samples=8, mask_sample_cap=4,
    test_max_per_img=5,
)


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    """Synthetic VOC2012-layout tree: train json + val split with masks."""
    root = tmp_path_factory.mktemp("VOC2012")
    (root / "JPEGImages").mkdir()
    (root / "SegmentationObject").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    (root / "Annotations_coco").mkdir()
    rng = np.random.RandomState(0)

    images, annotations = [], []
    val_ids = []
    palette = []
    for i in range(256):
        palette += [i, (i * 37) % 256, (i * 91) % 256]
    for i in range(4):
        h, w = (120, 160) if i % 2 == 0 else (160, 120)
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"2012_{i:06d}"
        Image.fromarray(arr).save(root / "JPEGImages" / f"{name}.jpg")
        images.append(dict(id=i, file_name=f"{name}.jpg", width=w, height=h))
        annotations.append(dict(
            id=2 * i, image_id=i, category_id=1 + i % 3,
            point=[w * 0.4, h * 0.4],
        ))
        annotations.append(dict(
            id=2 * i + 1, image_id=i, category_id=1 + (i + 1) % 3,
            point=[w * 0.7, h * 0.6],
        ))
        # val gt: one object blob + class png
        obj = np.zeros((h, w), np.uint8)
        obj[h // 4 : h // 2, w // 4 : w // 2] = 1
        cls = np.zeros((h, w), np.uint8)
        cls[obj == 1] = 1 + i % 3
        for sub, a in (("SegmentationObject", obj), ("SegmentationClass", cls)):
            im = Image.fromarray(a, mode="P")
            im.putpalette(palette)
            im.save(root / sub / f"{name}.png")
        val_ids.append(name)

    cats = [dict(id=k + 1, name=n) for k, n in enumerate(
        ["aeroplane", "bicycle", "bird"])]
    (root / "Annotations_coco" / "train.json").write_text(
        json.dumps(dict(images=images, annotations=annotations, categories=cats))
    )
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(val_ids[:2]) + "\n"
    )
    return root


@pytest.fixture(scope="module")
def smoke_config(voc_tree, tmp_path_factory):
    cfg_dir = tmp_path_factory.mktemp("cfg")
    cfg = cfg_dir / "smoke.py"
    cfg.write_text(f"""
model = dict(**{TINY_MODEL!r})
data = dict(
    train=dict(
        ann_file={str(voc_tree / 'Annotations_coco' / 'train.json')!r},
        img_prefix={str(voc_tree / 'JPEGImages')!r},
        repeat=1,
    ),
    val=dict(
        split_file={str(voc_tree / 'ImageSets' / 'Segmentation' / 'val.txt')!r},
        voc_root={str(voc_tree)!r},
    ),
    batch_size=1,
    num_threads=2,
    max_gt=4,
    flip_ratio=0.5,
    # exercise the config->TrainPipeline plumb for the COCO-config augs
    crop_size=(88, 152),
    brightness_delta=0.07,
    train_scales=[(96, 160)],
    test_scale=(96, 160),
)
optimizer = dict(base_lr=1e-4, weight_decay=0.05, layer_decay=0.75,
                 accumulate_steps=1, grad_clip=None)
schedule = dict(total_epochs=1, decay_epochs=[8, 11], warmup_iters=5,
                warmup_ratio=1e-3)
runtime = dict(log_interval=1, checkpoint_interval=1, eval_interval=1,
               seed=0, loss_weight_start_epoch=-1)
""")
    return str(cfg)


def _run(cmd, timeout=1500):
    env = dict(os.environ)
    env["ATTNSHIFT_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "")
    return subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout
    )


def test_config_system(smoke_config):
    from attentionshift_tpu.config import Config

    cfg = Config.fromfile(smoke_config)
    assert cfg.model.embed_dim == 48
    cfg2 = cfg.merge_from_options(["optimizer.base_lr=5e-05", "model.depth=4"])
    assert cfg2.optimizer.base_lr == 5e-05
    assert cfg.optimizer.base_lr == 1e-4  # original untouched


def test_base_config_inheritance():
    from attentionshift_tpu.config import Config

    cfg = Config.fromfile(os.path.join(REPO, "configs", "attnshift_voc12aug.py"))
    assert cfg.model.embed_dim == 384  # leaf
    assert cfg.optimizer.layer_decay == 0.75  # from _base_ schedule
    assert cfg.data.max_gt == 20  # from _base_ data


@pytest.mark.medium
def test_train_cli_and_resume(smoke_config, tmp_path):
    work = str(tmp_path / "work")
    r = _run([sys.executable, "tools/train.py", smoke_config,
              "--work-dir", work, "--max-steps", "2", "--validate-limit", "1"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "training done" in r.stdout
    assert os.path.isdir(os.path.join(work, "epoch_1"))

    # auto-resume path: run again; should pick up epoch_1 and stop at once
    r2 = _run([sys.executable, "tools/train.py", smoke_config,
               "--work-dir", work, "--max-steps", "1"])
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "resumed from" in r2.stdout

    # eval CLI against the trained checkpoint
    r3 = _run([sys.executable, "tools/test.py", smoke_config,
               os.path.join(work, "epoch_1"), "--limit", "2"])
    assert r3.returncode == 0, r3.stdout[-2000:] + r3.stderr[-2000:]
    out = json.loads(r3.stdout.strip().splitlines()[-1])
    assert set(out) == {"mAP@0.25", "mAP@0.5", "mAP@0.75"}
    for v in out.values():
        assert np.isfinite(v) and 0.0 <= v <= 1.0


def test_all_shipped_configs_load():
    from attentionshift_tpu.config import Config

    for name in ["attnshift_voc12aug.py", "attnshift_coco.py",
                 "attnshift_voc12aug_ts.py", "attnshift_voc12aug_swin.py"]:
        cfg = Config.fromfile(os.path.join(REPO, "configs", name))
        assert "model" in cfg or "swin" in cfg
    ts = Config.fromfile(os.path.join(REPO, "configs", "attnshift_voc12aug_ts.py"))
    assert ts.teacher.enabled is True
    assert ts.model.embed_dim == 384  # inherited through the leaf base


def test_fidelity_gated_knobs_agree_with_detector_defaults():
    """The flagship config and AttnShiftDetector defaults must agree on
    every knob the FIDELITY.md stride gate covers (VERDICT r4 #6) — a
    library user instantiating the detector bare gets the same gated
    semantics the benched config ships. ViT-16-capture configs inherit
    the gate; Swin (stride-32 capture) documents its divergence inline.
    """
    from attentionshift_tpu.config import Config
    from attentionshift_tpu.models.detector import AttnShiftDetector

    gated = ["cam_stride", "seed_map_stride"]
    flagship = Config.fromfile(
        os.path.join(REPO, "configs", "attnshift_voc12aug.py"))
    for knob in gated:
        default = getattr(AttnShiftDetector, knob)
        assert flagship.model.get(knob, default) == default, knob
        # COCO shares the ViT-S/16 capture geometry -> same gate applies
        coco = Config.fromfile(os.path.join(REPO, "configs", "attnshift_coco.py"))
        assert coco.model.get(knob, default) == default, knob


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    """Synthetic COCO tree with polygon segmentations + points."""
    root = tmp_path_factory.mktemp("coco")
    (root / "imgs").mkdir()
    rng = np.random.RandomState(1)
    images, annotations = [], []
    for i in range(3):
        h, w = 120, 160
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "imgs" / f"{i}.jpg")
        images.append(dict(id=i, file_name=f"{i}.jpg", width=w, height=h))
        annotations.append(dict(
            id=2 * i, image_id=i, category_id=1 + i % 2,
            point=[40.0 + i * 5, 50.0],
            segmentation=[[20, 30, 70, 30, 70, 80, 20, 80]], iscrowd=0,
        ))
        annotations.append(dict(
            id=2 * i + 1, image_id=i, category_id=2 - i % 2,
            point=[110.0, 60.0],
            segmentation=[[90, 40, 140, 40, 140, 90, 90, 90]], iscrowd=0,
        ))
    cats = [dict(id=1, name="thing"), dict(id=2, name="stuff")]
    f = root / "ann.json"
    f.write_text(json.dumps(dict(images=images, annotations=annotations,
                                 categories=cats)))
    return root


def test_coco_cli_train_and_eval(coco_tree, tmp_path):
    cfg = tmp_path / "coco_smoke.py"
    cfg.write_text(f"""
model = dict(**{TINY_MODEL!r})
data = dict(
    train=dict(
        type="COCOPointDataset",
        ann_file={str(coco_tree / 'ann.json')!r},
        img_prefix={str(coco_tree / 'imgs')!r},
        repeat=1,
    ),
    val=dict(
        type="COCOEvalDataset",
        ann_file={str(coco_tree / 'ann.json')!r},
        img_prefix={str(coco_tree / 'imgs')!r},
    ),
    batch_size=1,
    num_threads=2,
    max_gt=4,
    flip_ratio=0.5,
    train_scales=[(96, 160)],
    test_scale=(96, 160),
)
optimizer = dict(base_lr=1e-4, weight_decay=0.05, layer_decay=0.75,
                 accumulate_steps=1, grad_clip=None)
schedule = dict(total_epochs=1, decay_epochs=[8, 11], warmup_iters=5,
                warmup_ratio=1e-3)
runtime = dict(log_interval=1, checkpoint_interval=1, eval_interval=1,
               seed=0, loss_weight_start_epoch=-1)
""")
    work = str(tmp_path / "work")
    r = _run([sys.executable, "tools/train.py", str(cfg),
              "--work-dir", work, "--max-steps", "1"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    r2 = _run([sys.executable, "tools/test.py", str(cfg),
               os.path.join(work, "epoch_1"), "--limit", "2"])
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    out = json.loads(r2.stdout.strip().splitlines()[-1])
    assert set(out) == {"AP", "AP50", "AP75"}


@pytest.mark.medium
def test_train_cli_tensor_parallel(smoke_config, tmp_path):
    """VERDICT round-2 item 4: TP/SP must be reachable from the shipped
    CLI. An 8-virtual-device run with `parallel = dict(model=2, data=1)`
    must build a (1, 2) mesh, TP-shard params + optimizer moments via
    parallel.mesh.place_state (the same path the multichip dryrun uses),
    and finish a train step."""
    work = str(tmp_path / "work_tp")
    env = dict(os.environ)
    env["ATTNSHIFT_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, "tools/train.py", smoke_config,
         "--work-dir", work, "--max-steps", "1", "--no-validate",
         "--cfg-options", "parallel.model=2", "parallel.data=1",
         "parallel.sequence_parallel=True"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "parallel: mesh" in r.stdout, r.stdout[-2000:]
    assert "'model': 2" in r.stdout
    assert "training done" in r.stdout
