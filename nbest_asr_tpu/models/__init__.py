from .encoder import EncoderConfig, init_encoder_params, encoder_forward
from .heads import init_head_params, hierarchical_head
from .model import ModelConfig, init_model_params, model_forward

__all__ = [
    "EncoderConfig",
    "init_encoder_params",
    "encoder_forward",
    "init_head_params",
    "hierarchical_head",
    "ModelConfig",
    "init_model_params",
    "model_forward",
]
