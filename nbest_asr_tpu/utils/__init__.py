from .logging import make_logger
from .exp_dir import get_exp_dir

__all__ = ["make_logger", "get_exp_dir"]
