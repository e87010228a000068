"""Overfit sanity check (the reference's `debug.py` de-facto integration
test, SURVEY.md section 4): train the full flagship model on a tiny
synthetic blob dataset for 60 steps on the local accelerator and assert
the losses decrease. Measured on a v5e chip: ~0.53 s/step at 512x512
including pseudo-label generation (total loss 144.8 -> 9.7).

    python tools/debug_overfit.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from attentionshift_tpu.models.detector import AttnShiftDetector
from attentionshift_tpu.train import TrainState, build_optimizer, make_train_step

model = AttnShiftDetector(
    num_classes=20, embed_dim=384, depth=12, num_heads=6, img_size=224,
    point_tokens=100, cam_layer=7, max_gt=8, use_remat=True,
    use_pallas_attention=True, use_pallas_ccl=True, num_proposals=512, rpn_nms_pre=1000,
    rcnn_samples=256, mask_sample_cap=64, dtype=jnp.bfloat16)

B, H, W, G = 1, 512, 512, 8
rng = np.random.RandomState(0)
# synthetic dataset: 8 images with colored blobs at known points
def make_sample(i):
    img = rng.randn(H, W, 3).astype(np.float32) * 0.1
    pts, lbls = [], []
    for j in range(2):
        cx, cy = rng.randint(100, 412), rng.randint(100, 412)
        r = rng.randint(40, 90)
        yy, xx = np.mgrid[:H, :W]
        blob = ((xx-cx)**2 + (yy-cy)**2) < r*r
        color = np.zeros(3); color[(i+j) % 3] = 2.5
        img[blob] += color
        pts.append([cx, cy]); lbls.append((i+j) % 3)
    g_pts = np.zeros((G,2), np.float32); g_pts[:2] = pts
    g_lbl = np.zeros((G,), np.int32); g_lbl[:2] = lbls
    g_val = np.zeros((G,), bool); g_val[:2] = True
    return img, g_pts, g_lbl, g_val
data = [make_sample(i) for i in range(8)]

key = jax.random.PRNGKey(0)
img0 = jnp.zeros((B,H,W,3), jnp.float32)
params = model.init({"params": key, "sampling": key, "dropout": key},
    img0, jnp.zeros((B,G,2)), jnp.zeros((B,G), jnp.int32), jnp.zeros((B,G), bool),
    jnp.asarray([[512.,512.]]))
tx = build_optimizer(params, base_lr=1e-4, steps_per_epoch=100, accumulate_steps=1,
                     depth=12, warmup_iters=10)
state = TrainState.create(params, tx)
step = make_train_step(model, donate=False)
wh = jnp.asarray([[512., 512.]])

hist = []
t0 = time.time()
for it in range(60):
    img, pts, lbl, val = data[it % 8]
    batch = dict(img=jnp.asarray(img)[None], gt_points=jnp.asarray(pts)[None],
                 gt_labels=jnp.asarray(lbl)[None], gt_valid=jnp.asarray(val)[None],
                 img_wh=wh)
    state, m = step(state, batch, jax.random.PRNGKey(42))
    if it in (0, 1):
        jax.block_until_ready(m)
        print(f"step {it} done at {time.time()-t0:.0f}s", flush=True)
    hist.append({k: float(v) for k, v in m.items()})
jax.block_until_ready(m)
dt = time.time() - t0
first = {k: np.mean([h[k] for h in hist[:8]]) for k in hist[0]}
last = {k: np.mean([h[k] for h in hist[-8:]]) for k in hist[0]}
print(f"60 steps in {dt:.0f}s")
for k in sorted(first):
    print(f"{k:>16s}: {first[k]:8.3f} -> {last[k]:8.3f}")
dec = [k for k in first if k.startswith('loss') and last[k] < first[k]]
print("decreased:", dec)
assert last["loss_total"] < first["loss_total"], "total loss did not decrease"
assert last["loss_point_cls"] < first["loss_point_cls"]
print("OK: model learns on TPU")
