from .attention import multi_head_attention
from .layers import layer_norm, dense, gelu

__all__ = ["multi_head_attention", "layer_norm", "dense", "gelu"]
