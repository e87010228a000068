# VOC point-supervision data (mirrors configs/_base_/datasets/voc_instance_aug.py)
data_root = "/root/datasets/VOC2012"

data = dict(
    train=dict(
        type="VOCPointDataset",
        ann_file=data_root + "/Annotations_coco/center_points/gt_center_train2012.json",
        img_prefix=data_root + "/JPEGImages",
        repeat=4,  # RepeatDataset x4
    ),
    val=dict(
        type="VOCInstanceEvalDataset",
        split_file=data_root + "/ImageSets/Segmentation/val.txt",
        voc_root=data_root,
    ),
    batch_size=2,  # per host; effective batch = batch_size (DP-sharded)
    num_threads=4,
    max_gt=20,
    flip_ratio=0.5,
    train_scales=[(s, 1333) for s in range(480, 801, 32)],
    test_scale=(600, 1000),
)
