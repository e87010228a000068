# AttnShift-B on MS-COCO: the ViT-B row of the paper's Table 2
# (`figures/Perform-COCO.jpg`: 21.2/42.0/19.4 val2017, 21.9/43.5/20.1
# test-dev). The reference ships only the ViT-S COCO config; the -B
# variant differs in backbone width/heads and the MAE-B init
# (`README.md:10-13`: mae_pretrain_vit_base.pth).
_base_ = ["attnshift_coco.py"]

pretrained = "mae_pretrain_vit_base.pth"

model = dict(
    embed_dim=768,
    num_heads=12,
    # deeper trunk -> keep remat on; layer-decay keys follow depth=12
)

optimizer = dict(
    # ViT-B MAE fine-tune convention: stronger layer decay than -S
    layer_decay=0.65,
)
