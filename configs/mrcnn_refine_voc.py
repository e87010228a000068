# Mask R-CNN self-training refinement on AttnShift pseudo labels
# (the paper's AttnShift-dagger VOC rows, figures/Perform-VOC.jpg):
#   1. train configs/attnshift_voc12aug.py
#   2. python tools/gen_pseudo_labels.py configs/attnshift_voc12aug.py \
#          work_dirs/voc/epoch_12 --out work_dirs/voc/pseudo_train.json
#   3. python tools/train.py configs/mrcnn_refine_voc.py \
#          --work-dir work_dirs/mrcnn_refine
# Recipe mirrors stock mmdet mask_rcnn_r50_fpn_1x (SGD 0.02, 1x steps),
# scaled to the effective batch here.
_base_ = ["_base_/schedule_1x.py"]

data_root = "/root/datasets/VOC2012"

model_type = "mask_rcnn"
pretrained = ""  # optional torchvision resnet50 .pth

model = dict(
    num_classes=20,
    rpn_channels=256,
    num_proposals=1000,
    rpn_nms_pre=2000,
    rcnn_samples=512,
    rcnn_pos_fraction=0.25,
    mask_sample_cap=128,
    mask_stride=4,
    depths=(3, 4, 6, 3),  # resnet50
    frozen_stages=1,
    test_score_thr=0.05,
    test_iou_thr=0.5,
    test_max_per_img=100,
)

data = dict(
    train=dict(
        type="InstanceCocoDataset",
        ann_file="work_dirs/voc/pseudo_train.json",
        img_prefix=data_root + "/JPEGImages",
        repeat=1,
    ),
    val=dict(
        type="VOCInstanceEvalDataset",
        split_file=data_root + "/ImageSets/Segmentation/val.txt",
        voc_root=data_root,
    ),
    batch_size=2,
    num_threads=4,
    max_gt=20,
    flip_ratio=0.5,
    train_scales=[(800, 1333)],  # single-scale, stock mrcnn recipe
    test_scale=(800, 1333),
)

optimizer = dict(
    _delete_=True,
    base_lr=0.0025,  # 0.02 * (eff. batch 2 / 16), linear scaling rule
    momentum=0.9,
    weight_decay=1e-4,
    accumulate_steps=1,
    grad_clip=None,
)
