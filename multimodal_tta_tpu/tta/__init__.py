from .engine import TTAEngine  # noqa: F401
from .tent import TentAdapter, norm_param_mask  # noqa: F401 (registers "tent")

__all__ = ["TTAEngine", "TentAdapter", "norm_param_mask"]
