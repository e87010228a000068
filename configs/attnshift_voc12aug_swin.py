# Swin-backbone attention-shift variant (BASELINE config 5).
# The reference registered a Swin backbone but shipped no attnshift Swin
# config; this one uses models/swin.py with the attnshift hook (global
# attention + point tokens on the stride-32 stage).
_base_ = ["_base_/voc_data.py", "_base_/schedule_1x.py"]

backbone_type = "swin"

swin = dict(
    embed_dim=96,
    depths=[2, 2, 6, 2],
    num_heads=[3, 6, 12, 24],
    window_size=7,
    attnshift=True,
    point_tokens=100,
    global_blocks=4,
)

model = dict(
    num_classes=20,
    max_gt=20,
    seed_thr=0.2,
    seed_multiple=0.5,
    # Swin captures attention at stride 32 (models/swin.py: global
    # attnshift blocks on the merged stride-32 grid), so the FIDELITY.md
    # ViT gate (cam_stride = the 16px capture stride) does not transfer:
    # neither 8 nor 16 equals Swin's capture grid. 8 is kept as the
    # conservative finer-detail setting pending a Swin-geometry gate;
    # deliberately differs from the ViT default (VERDICT r4 #6).
    cam_stride=8,
    pos_mask_thr=0.35,
    neg_mask_thr=0.8,
    num_mask_point_gt=10,
    corr_size=21,
    obj_tau=0.9,
    mean_shift_times=10,
    num_semantic_points=5,
    rpn_channels=256,
    num_proposals=1000,
    rcnn_samples=512,
)
