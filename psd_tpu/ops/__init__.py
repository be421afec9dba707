from .attention import attention_probs, dot_product_attention, set_attention_backend
from .norms import GroupNorm, group_norm
from .split3 import split3_attention

__all__ = [
    "attention_probs", "dot_product_attention", "set_attention_backend",
    "GroupNorm", "group_norm", "split3_attention",
]
