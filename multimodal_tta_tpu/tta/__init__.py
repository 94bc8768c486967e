from .cotta import CottaAdapter  # noqa: F401 (registers "cotta")
from .engine import TTAEngine  # noqa: F401
from .norm_adapt import NormAdapter  # noqa: F401 (registers "norm")
from .stream import StreamTTAController  # noqa: F401
from .tent import TentAdapter, norm_param_mask  # noqa: F401 (registers "tent")

__all__ = [
    "TTAEngine",
    "TentAdapter",
    "CottaAdapter",
    "NormAdapter",
    "StreamTTAController",
    "norm_param_mask",
]
