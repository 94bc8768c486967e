from .cotta import CottaAdapter  # noqa: F401 (registers "cotta")
from .eata import EataAdapter  # noqa: F401 (registers "eata")
from .engine import TTAEngine  # noqa: F401
from .norm_adapt import NormAdapter  # noqa: F401 (registers "norm")
from .sar import SarAdapter  # noqa: F401 (registers "sar")
from .stream import StreamTTAController  # noqa: F401
from .tent import TentAdapter, norm_param_mask  # noqa: F401 (registers "tent")

__all__ = [
    "TTAEngine",
    "TentAdapter",
    "CottaAdapter",
    "NormAdapter",
    "SarAdapter",
    "StreamTTAController",
    "norm_param_mask",
]
