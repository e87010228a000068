"""Tests for the tool surface added for reference CLI parity:
dataset converter, offline eval_metric, analyze_results, print_config,
and the launcher env-var contract."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


@pytest.fixture(scope="module")
def voc_seg_tree(tmp_path_factory):
    """VOC tree with palette segmentation pngs for the converter."""
    root = tmp_path_factory.mktemp("VOCconv")
    for sub in ("JPEGImages", "SegmentationObject", "SegmentationClass"):
        (root / sub).mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    palette = []
    for i in range(256):
        palette += [i, (i * 37) % 256, (i * 91) % 256]
    rng = np.random.RandomState(0)
    ids = []
    for i in range(2):
        h, w = 60, 80
        name = f"2012_{i:06d}"
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            root / "JPEGImages" / f"{name}.jpg"
        )
        obj = np.zeros((h, w), np.uint8)
        cls = np.zeros((h, w), np.uint8)
        # instance 1: rectangle, class 2 (bicycle); instance 2: class 5
        obj[10:30, 10:40] = 1
        cls[10:30, 10:40] = 2
        obj[35:55, 50:70] = 2
        cls[35:55, 50:70] = 5
        # ignore border around instance 1
        obj[9, 9:41] = 255
        cls[9, 9:41] = 255
        for sub, a in (("SegmentationObject", obj), ("SegmentationClass", cls)):
            im = Image.fromarray(a, mode="P")
            im.putpalette(palette)
            im.save(root / sub / f"{name}.png")
        ids.append(name)
    (root / "ImageSets" / "Segmentation" / "train.txt").write_text(
        "\n".join(ids) + "\n"
    )
    return root


def test_pascal_voc_converter(voc_seg_tree, tmp_path):
    out = tmp_path / "points.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/dataset_converters/pascal_voc.py"),
         "--voc-root", str(voc_seg_tree), "--split", "train", "--out", str(out)],
        capture_output=True, text=True, env=ENV, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    d = json.loads(out.read_text())
    assert len(d["images"]) == 2
    assert len(d["annotations"]) == 4  # 2 instances per image
    assert len(d["categories"]) == 20

    a = d["annotations"][0]
    # point = mask-bbox centre (voc_instance.py:139 recipe)
    x, y, w, h = a["bbox"]
    assert a["point"] == [x + w / 2, y + h / 2]
    assert a["bbox"] == [10.0, 10.0, 30.0, 20.0]
    assert a["category_id"] == 2  # class png id 2 -> label 1 -> category 2
    # RLE decodes back to the drawn rectangle
    from attentionshift_tpu.native import rle_decode, rle_from_string

    rle = rle_from_string(
        a["segmentation"]["counts"], a["segmentation"]["size"]
    )
    m = rle_decode(rle)
    assert m.sum() == 20 * 30 and m[10:30, 10:40].all()

    # the training dataset consumes the converter output directly
    from attentionshift_tpu.data.voc import VOCPointDataset

    ds = VOCPointDataset(str(out), str(voc_seg_tree / "JPEGImages"))
    assert len(ds) == 2
    s = ds[0]
    assert s["points"].shape == (2, 2) and s["labels"].tolist() == [1, 4]


@pytest.fixture(scope="module")
def preds_dump(tmp_path_factory):
    """Perfect-prediction dump: metric must be 1.0 at every threshold."""
    h, w = 40, 50
    m1 = np.zeros((h, w), bool); m1[5:20, 5:25] = True
    m2 = np.zeros((h, w), bool); m2[25:38, 30:48] = True
    preds = dict(
        masks=[np.stack([m1, m2])], labels=[np.asarray([1, 3])],
        scores=[np.asarray([0.9, 0.8])],
    )
    gts = dict(
        masks=[np.stack([m1, m2])], labels=[np.asarray([1, 3])],
        crowd=[np.zeros(2, bool)],
    )
    p = tmp_path_factory.mktemp("dump") / "preds.pkl"
    with open(p, "wb") as f:
        pickle.dump(dict(preds=preds, gts=gts, is_coco=False, num_classes=20), f)
    return p


def test_eval_metric_offline(preds_dump):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/analysis/eval_metric.py"),
         str(preds_dump), "--iou", "0.5", "0.75"],
        capture_output=True, text=True, env=ENV, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    res = json.loads(r.stdout)
    assert res["mAP@0.5"] == pytest.approx(1.0)
    assert res["mAP@0.75"] == pytest.approx(1.0)


def test_analyze_results(preds_dump, voc_seg_tree, tmp_path):
    # analyze_results needs a val-style dataset; build split over the same ids
    split = tmp_path / "val.txt"
    split.write_text("2012_000000\n")
    # shrink the dump to image sizes matching the tree (60x80)
    with open(preds_dump, "rb") as f:
        d = pickle.load(f)
    m = np.zeros((60, 80), bool); m[10:30, 10:40] = True
    d["preds"] = dict(masks=[np.stack([m])], labels=[np.asarray([1])],
                      scores=[np.asarray([0.9])])
    d["gts"] = dict(masks=[np.stack([m])], labels=[np.asarray([1])],
                    crowd=[np.zeros(1, bool)])
    dump2 = tmp_path / "preds2.pkl"
    with open(dump2, "wb") as f:
        pickle.dump(d, f)
    out = tmp_path / "vis"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/analysis/analyze_results.py"),
         str(dump2), "--dataset-split", str(split),
         "--voc-root", str(voc_seg_tree), "--out", str(out), "-k", "1"],
        capture_output=True, text=True, env=ENV, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    pngs = sorted(os.listdir(out))
    assert any(p.startswith("good_") for p in pngs)
    assert any(p.startswith("bad_") for p in pngs)


def test_print_config(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(depth=4)\nruntime = dict(seed=0)\n")
    leaf = tmp_path / "leaf.py"
    leaf.write_text(
        f"_base_ = [{str(base)!r}]\nmodel = dict(num_heads=2)\n"
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/misc/print_config.py"),
         str(leaf), "--cfg-options", "model.depth=8"],
        capture_output=True, text=True, env=ENV, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    cfg = json.loads(r.stdout)
    assert cfg["model"] == {"depth": 8, "num_heads": 2}
    assert cfg["runtime"] == {"seed": 0}


def test_error_analysis(tmp_path):
    """Synthetic dump with one of each error type; counts must match."""
    h, w = 40, 60

    def m(y, x, s=10):
        a = np.zeros((h, w), bool)
        a[y:y + s, x:x + s] = True
        return a

    g1, g2 = m(2, 2), m(25, 40)
    preds = dict(
        masks=[np.stack([
            m(2, 2),          # correct (class 0, IoU 1 with g1)
            m(4, 4),          # dup/loc vs g1 — scored lower, IoU 0.47 -> loc
            m(25, 40),        # cls error: right place, wrong class
            m(2, 45),         # bg: overlaps nothing
        ])],
        labels=[np.asarray([0, 0, 3, 1])],
        scores=[np.asarray([0.9, 0.8, 0.7, 0.6])],
    )
    gts = dict(
        masks=[np.stack([g1, g2])],
        labels=[np.asarray([0, 5])],  # g2's class 5 never predicted -> missed
        crowd=[np.zeros(2, bool)],
    )
    dump = tmp_path / "d.pkl"
    with open(dump, "wb") as f:
        pickle.dump(dict(preds=preds, gts=gts, is_coco=False, num_classes=20), f)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/analysis/error_analysis.py"),
         str(dump)],
        capture_output=True, text=True, env=ENV, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    rep = json.loads(r.stdout)
    assert rep["totals"]["correct"] == 1
    assert rep["totals"]["loc"] == 1
    assert rep["totals"]["cls"] == 1
    assert rep["totals"]["bg"] == 1
    assert rep["totals"]["missed"] == 1
    assert rep["recall"] == 0.5


def test_corruptions():
    from attentionshift_tpu.data.corruptions import (
        CORRUPTIONS, CorruptedDataset, corrupt,
    )

    rng = np.random.RandomState(0)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    for name in CORRUPTIONS:
        out = corrupt(img, name, 3)
        assert out.shape == img.shape and out.dtype == np.uint8, name
        # deterministic given (img, severity, seed)
        assert np.array_equal(out, corrupt(img, name, 3)), name
        # actually does something
        assert not np.array_equal(out, img), name
    # noise magnitude grows with severity
    e1 = np.abs(corrupt(img, "gaussian_noise", 1).astype(int) - img).mean()
    e5 = np.abs(corrupt(img, "gaussian_noise", 5).astype(int) - img).mean()
    assert e5 > e1
    with pytest.raises(ValueError):
        corrupt(img, "gaussian_noise", 6)

    # the full 15-corruption benchmark protocol is covered asset-free
    # (reference test_robustness.py:225-231), frost included (r5)
    benchmark15 = {
        "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
        "glass_blur", "motion_blur", "zoom_blur", "snow", "frost", "fog",
        "brightness", "contrast", "elastic_transform", "pixelate",
        "jpeg_compression",
    }
    assert benchmark15 <= set(CORRUPTIONS)
    # frost severity ramp: corruption magnitude grows 1 -> 5
    f1 = np.abs(corrupt(img, "frost", 1).astype(int) - img).mean()
    f5 = np.abs(corrupt(img, "frost", 5).astype(int) - img).mean()
    assert f5 > f1

    class DS:
        num_classes = 20

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return dict(img=img, img_id="x")

        def gt_instances(self, i):
            return dict(masks=np.zeros((0, 48, 64), bool),
                        labels=np.zeros((0,), np.int64))

    cd = CorruptedDataset(DS(), "contrast", 2)
    assert len(cd) == 1 and cd.num_classes == 20
    assert not np.array_equal(cd[0]["img"], img)
    assert cd.gt_instances(0)["masks"].shape == (0, 48, 64)


TINY_CFG = """
model = dict(
    num_classes=20, embed_dim=48, depth=4, num_heads=6, out_indices=(0, 1, 2, 3),
    img_size=64, point_tokens=10, cam_layer=3, use_remat=False, max_gt=4,
    cam_stride=4, ccl_iters=8, num_mask_point_gt=4, corr_size=3,
    mean_shift_times=2, num_semantic_points=2, rpn_channels=16,
    num_proposals=16, rpn_nms_pre=16, rcnn_samples=8, mask_sample_cap=4,
    test_max_per_img=5,
)
data = dict(test_scale=(96, 160), max_gt=4)
"""


@pytest.mark.slow
@pytest.mark.medium
def test_export_stablehlo_roundtrip(tmp_path):
    """Serialized-StableHLO export + deserialize round-trip (tiny model)."""
    cfg = tmp_path / "tiny.py"
    cfg.write_text(TINY_CFG)
    out = tmp_path / "det.stablehlo"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/deployment/export_stablehlo.py"),
         str(cfg), "--out", str(out), "--scale", "96", "160"],
        capture_output=True, text=True, env=ENV, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "round-trip check OK" in r.stdout
    assert out.stat().st_size > 1_000_000  # weights baked in


@pytest.mark.slow
@pytest.mark.medium
def test_robustness_tool(tmp_path, voc_seg_tree):
    """P/PC/mPC corruption benchmark end-to-end on a synthetic val set."""
    split = voc_seg_tree / "ImageSets" / "Segmentation" / "train.txt"
    cfg = tmp_path / "rob.py"
    cfg.write_text(TINY_CFG + f"""
data.update(val=dict(split_file={str(split)!r}, voc_root={str(voc_seg_tree)!r}))
""")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/analysis/test_robustness.py"),
         str(cfg), "--corruptions", "contrast", "--severities", "1",
         "--limit", "1"],
        capture_output=True, text=True, env=ENV, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # the summary is the only top-level (column-0) JSON object printed
    summary = json.loads(r.stdout[r.stdout.index("\n{") + 1:])
    assert set(summary) >= {"P", "PC", "mPC"}


def test_launcher_env_contract():
    """dist/slurm launchers export the vars tools/train.py consumes."""
    train = open(os.path.join(REPO, "tools/train.py")).read()
    for var in ("JAX_PROCESS_COUNT", "JAX_COORDINATOR", "JAX_PROCESS_ID"):
        assert var in train
    slurm = open(os.path.join(REPO, "tools/slurm_train.sh")).read()
    for var in ("JAX_COORDINATOR", "JAX_PROCESS_COUNT", "JAX_PROCESS_ID"):
        assert f"export {var}" in slurm


def test_sweep_dry_run():
    """sweep.py expands the grid into per-run train.py commands."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/sweep.py"),
         "configs/attnshift_voc12aug.py",
         "--grid", "model.obj_tau=0.85,0.9",
         "--grid", "model.num_semantic_points=3,5",
         "--dry-run", "--", "--max-steps", "5"],
        capture_output=True, text=True, env=ENV, timeout=900, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("[sweep]")]
    assert len(lines) == 4
    assert "--cfg-options model.obj_tau=0.85 model.num_semantic_points=3" in lines[0]
    assert lines[0].endswith("--max-steps 5")
    # run names are distinct and derived from the override values
    names = [l.split()[1].rstrip(":") for l in lines]
    assert len(set(names)) == 4


def test_shipped_configs_load_and_vitb_merges():
    """Every shipped config parses; the ViT-B COCO leaf inherits the
    full ViT-S COCO tree and overrides only width/heads/decay/init."""
    from attentionshift_tpu.config import Config

    for name in sorted(os.listdir(os.path.join(REPO, "configs"))):
        if name.endswith(".py"):
            Config.fromfile(os.path.join(REPO, "configs", name))

    cfg = Config.fromfile(os.path.join(REPO, "configs/attnshift_coco_vitb.py"))
    assert cfg.model.embed_dim == 768 and cfg.model.num_heads == 12
    assert cfg.model.depth == 12 and cfg.model.with_reppoints_head
    assert cfg.optimizer.layer_decay == 0.65
    assert cfg.pretrained == "mae_pretrain_vit_base.pth"
    # JitterBrightness plumb (reference COCO config `attnshift_..._qc.py:236`)
    assert 0 < cfg.data.brightness_delta < 0.1


def test_cityscapes_converter(tmp_path):
    """Synthetic gtFine tree -> COCO json with the reference's semantics
    (`tools/dataset_converters/cityscapes.py` upstream): id>=1000 ->
    label*1000+i instances, [24,1000) -> crowd, 8 categories."""
    from PIL import Image

    root = tmp_path / "cs"
    for sub in ("leftImg8bit/val/cityA", "gtFine/val/cityA"):
        (root / sub).mkdir(parents=True)
    h, w = 40, 60
    name = "cityA_000000_000019"
    Image.new("RGB", (w, h)).save(
        root / "leftImg8bit/val/cityA" / f"{name}_leftImg8bit.png")
    inst = np.zeros((h, w), np.int32)
    inst[5:15, 5:25] = 26000  # car instance 0
    inst[20:35, 30:50] = 24001  # person instance 1
    inst[2:6, 40:55] = 25  # rider CROWD region (id < 1000)
    inst[0:3, 0:5] = 29000  # caravan: hasInstances but ignoreInEval -> dropped
    Image.fromarray(inst, mode="I").save(
        root / "gtFine/val/cityA" / f"{name}_gtFine_instanceIds.png")
    Image.fromarray((inst // 1000).astype(np.uint8)).save(
        root / "gtFine/val/cityA" / f"{name}_gtFine_labelIds.png")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/dataset_converters/cityscapes.py"),
         str(root), "-o", str(tmp_path / "out")],
        capture_output=True, text=True, env=ENV, timeout=900,
    )
    # train/test splits are missing in the synthetic tree: expect failure
    # AFTER val converted
    out = tmp_path / "out" / "instancesonly_filtered_gtFine_val.json"
    assert out.exists(), r.stderr
    d = json.loads(out.read_text())
    assert len(d["images"]) == 1
    assert d["images"][0]["file_name"] == f"cityA/{name}_leftImg8bit.png"
    annos = d["annotations"]
    assert len(annos) == 3  # car + person + rider crowd; caravan dropped
    by_cat = {a["category_id"]: a for a in annos}
    assert set(by_cat) == {24, 25, 26}
    assert by_cat[25]["iscrowd"] == 1 and by_cat[26]["iscrowd"] == 0
    assert by_cat[26]["bbox"] == [5.0, 5.0, 20.0, 10.0]
    assert by_cat[26]["area"] == 200.0
    assert [c["id"] for c in d["categories"]] == [24, 25, 26, 27, 28, 31, 32, 33]
    # RLE roundtrip
    from attentionshift_tpu.native import rle_decode, rle_from_string

    seg = by_cat[24]["segmentation"]
    m = rle_decode(rle_from_string(seg["counts"], seg["size"]))
    assert m.sum() == by_cat[24]["area"]
