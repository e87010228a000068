# 12-epoch schedule (mirrors configs/_base_/schedules/schedule_1x.py +
# the leaf config's AdamW override, attnshift_voc12aug.py:252-263)
optimizer = dict(
    base_lr=1e-4,
    weight_decay=0.05,
    layer_decay=0.75,
    accumulate_steps=2,
    grad_clip=None,
)
schedule = dict(
    total_epochs=12,
    decay_epochs=[8, 11],
    warmup_iters=500,
    warmup_ratio=1e-3,
)
runtime = dict(
    log_interval=50,
    checkpoint_interval=1,  # epochs
    eval_interval=1,
    seed=0,
    loss_weight_start_epoch=-1,  # LossWeightAdjustHook start_epoch
)
