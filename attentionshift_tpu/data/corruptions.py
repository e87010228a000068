"""Image corruption suite for robustness benchmarking.

Numpy/PIL reimplementation of the common-corruptions protocol the
reference's robustness tools consume through the ``imagecorruptions``
package (`tools/analysis_tools/test_robustness.py`,
`robustness_eval.py`): named corruption functions at severities 1-5,
applied to uint8 RGB images at eval time. The heavy weather corruptions
(snow/frost/fog need external assets) are replaced by the
photometric/noise/blur/digital families, which cover the benchmark's
noise, blur and digital groups.

All functions are deterministic given (img, severity, seed).
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image, ImageEnhance

__all__ = ["CORRUPTIONS", "corrupt", "CorruptedDataset"]


def _rng(img: np.ndarray, severity: int, seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed * 7 + severity + img.shape[0] + img.shape[1])


def _clip(x) -> np.ndarray:
    return np.clip(x, 0, 255).astype(np.uint8)


def gaussian_noise(img, severity, seed=0):
    c = [0.04, 0.06, 0.08, 0.09, 0.10][severity - 1] * 255
    return _clip(img.astype(np.float32) + _rng(img, severity, seed).randn(*img.shape) * c)


def shot_noise(img, severity, seed=0):
    c = [500, 250, 100, 75, 50][severity - 1]
    x = img.astype(np.float32) / 255.0
    return _clip(_rng(img, severity, seed).poisson(x * c) / c * 255.0)


def impulse_noise(img, severity, seed=0):
    c = [0.01, 0.02, 0.03, 0.05, 0.07][severity - 1]
    r = _rng(img, severity, seed)
    out = img.copy()
    m = r.rand(*img.shape[:2])
    out[m < c / 2] = 0
    out[(m >= c / 2) & (m < c)] = 255
    return out


def _box_blur(img, k):
    x = img.astype(np.float32)
    pad = k // 2
    xp = np.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    c = np.cumsum(np.cumsum(xp, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0), (0, 0)))
    h, w = img.shape[:2]
    s = (c[k:k + h, k:k + w] - c[:h, k:k + w] - c[k:k + h, :w] + c[:h, :w])
    return s / (k * k)


def defocus_blur(img, severity, seed=0):
    k = [3, 5, 7, 9, 11][severity - 1]
    return _clip(_box_blur(img, k))


def motion_blur(img, severity, seed=0):
    k = [5, 7, 9, 13, 17][severity - 1]
    x = img.astype(np.float32)
    pad = k // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    out = np.zeros_like(x)
    for i in range(k):  # horizontal streak
        out += xp[:, i : i + img.shape[1]]
    return _clip(out / k)


def brightness(img, severity, seed=0):
    c = [1.1, 1.2, 1.3, 1.4, 1.5][severity - 1]
    return np.asarray(
        ImageEnhance.Brightness(Image.fromarray(img)).enhance(c)
    )


def contrast(img, severity, seed=0):
    c = [0.75, 0.6, 0.45, 0.3, 0.2][severity - 1]
    return np.asarray(
        ImageEnhance.Contrast(Image.fromarray(img)).enhance(c)
    )


def saturate(img, severity, seed=0):
    c = [1.3, 1.6, 2.0, 2.4, 3.0][severity - 1]
    return np.asarray(
        ImageEnhance.Color(Image.fromarray(img)).enhance(c)
    )


def jpeg_compression(img, severity, seed=0):
    q = [80, 65, 50, 35, 20][severity - 1]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=q)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))


def pixelate(img, severity, seed=0):
    c = [0.9, 0.75, 0.6, 0.45, 0.3][severity - 1]
    h, w = img.shape[:2]
    im = Image.fromarray(img)
    im = im.resize((max(1, int(w * c)), max(1, int(h * c))), Image.BOX)
    return np.asarray(im.resize((w, h), Image.NEAREST))


CORRUPTIONS = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "defocus_blur": defocus_blur,
    "motion_blur": motion_blur,
    "brightness": brightness,
    "contrast": contrast,
    "saturate": saturate,
    "jpeg_compression": jpeg_compression,
    "pixelate": pixelate,
}


def corrupt(img: np.ndarray, name: str, severity: int, seed: int = 0) -> np.ndarray:
    """Apply corruption ``name`` at ``severity`` in [1, 5] to uint8 RGB."""
    if not 1 <= severity <= 5:
        raise ValueError(f"severity must be 1..5, got {severity}")
    return CORRUPTIONS[name](np.asarray(img, np.uint8), severity, seed)


class CorruptedDataset:
    """Eval-dataset wrapper applying one corruption to every image."""

    def __init__(self, dataset, name: str, severity: int, seed: int = 0):
        self.dataset = dataset
        self.name = name
        self.severity = severity
        self.seed = seed

    def __len__(self):
        return len(self.dataset)

    def __getattr__(self, attr):  # ids, gt_instances, num_classes, ...
        return getattr(self.dataset, attr)

    def __getitem__(self, idx):
        s = dict(self.dataset[idx])
        s["img"] = corrupt(s["img"], self.name, self.severity, self.seed)
        return s
