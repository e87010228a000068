# AttnShift on Pascal VOC 2012 aug, point supervision.
# TPU-native counterpart of configs/mae/attnshift_voc12aug.py.
_base_ = ["_base_/voc_data.py", "_base_/schedule_1x.py"]

pretrained = ""  # path to a torch MAE ViT-S checkpoint (optional)

model = dict(
    num_classes=20,
    embed_dim=384,
    depth=12,
    num_heads=6,
    img_size=224,
    point_tokens=100,
    cam_layer=7,
    drop_path_rate=0.05,
    use_remat=True,
    # pseudo-label engine (attnshift_voc12aug.py:11-17,101-104)
    max_gt=20,
    seed_thr=0.2,
    seed_multiple=0.5,
    # Stage-A CCL stride. 16 (= the ViT patch stride, so the CCL plane
    # IS the patch grid) dominates 8 on candidate-box fidelity vs the
    # exact stride-1 path at the bench geometry — FIDELITY.md round-4
    # study on the committed ckpt3k fixture, n=56: stride-16 candidate
    # IoU p10/p50/p90 = 0.44/0.97/1.00 vs stride-8's 0.29/0.87/0.99
    # (bilinear upsampling past patch res only adds threshold aliasing
    # at component boundaries) — and runs the CCL/extraction on 4x
    # fewer cells. bench.py measures THIS config, so the headline number
    # and the shipped training setting are the same thing (VERDICT
    # round-3 item 2). Exact reference semantics: cam_stride=1.
    cam_stride=16,
    pos_mask_thr=0.35,
    neg_mask_thr=0.8,
    num_mask_point_gt=10,
    corr_size=21,
    obj_tau=0.9,
    mean_shift_times=10,
    num_semantic_points=5,
    # rpn / rcnn (attnshift_voc12aug.py:146-197)
    rpn_channels=256,
    num_proposals=1000,
    rpn_nms_pre=2000,
    rcnn_samples=512,
    rcnn_pos_fraction=0.25,
    mask_sample_cap=128,
    # test (attnshift_voc12aug.py:198-214)
    test_score_thr=0.05,
    test_iou_thr=0.5,
    test_max_per_img=100,
)
