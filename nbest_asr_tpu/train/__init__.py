from .losses import total_loss, LossConfig
from .optimizer import make_optimizer, OptimizerConfig
from .decode import decode_multihot
from .metrics import f1_counts_from_multihot, compute_f1, update_f1

__all__ = [
    "total_loss",
    "LossConfig",
    "make_optimizer",
    "OptimizerConfig",
    "decode_multihot",
    "f1_counts_from_multihot",
    "compute_f1",
    "update_f1",
]
