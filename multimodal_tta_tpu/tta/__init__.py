from .cotta import CottaAdapter  # noqa: F401 (registers "cotta")
from .eata import EataAdapter  # noqa: F401 (registers "eata")
from .engine import TTAEngine, classifier_logits_apply  # noqa: F401
from .memo import MemoAdapter  # noqa: F401 (registers "memo")
from .norm_adapt import NormAdapter  # noqa: F401 (registers "norm")
from .pl import PseudoLabelAdapter  # noqa: F401 (registers "pl")
from .sar import SarAdapter  # noqa: F401 (registers "sar")
from .stream import StreamTTAController  # noqa: F401
from .tent import TentAdapter, norm_param_mask  # noqa: F401 (registers "tent")

__all__ = [
    "TTAEngine",
    "classifier_logits_apply",
    "TentAdapter",
    "CottaAdapter",
    "MemoAdapter",
    "NormAdapter",
    "SarAdapter",
    "StreamTTAController",
    "norm_param_mask",
]
