# EMA teacher-student variant of the VOC config
# (FasterRCNNPointSupAlignTS + EpochBasedRunnerAmpTS analog).
_base_ = ["attnshift_voc12aug.py"]

teacher = dict(
    enabled=True,
    momentum=0.999,
)
