from .rollout import attention_rollout_point_rows, augment_attention

__all__ = ["attention_rollout_point_rows", "augment_attention"]
