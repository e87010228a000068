# Keypoint-align variant of the VOC config
# (FasterRCNNPointSupAlignKeyPoint + SimpleCondInstHead analog,
# `faster_rcnn_pointSup_keypoint_align.py:8-165`).
_base_ = ["attnshift_voc12aug.py"]

model = dict(
    with_keypoint_align=True,
    keypoint_feat_channels=8,
)
