from .config import get_config, require_config
from .logger import get_logger, setup_logger, LoggerWriter
from .metrics import AverageMeter, set_random_seed

__all__ = [
    "get_config",
    "require_config",
    "get_logger",
    "setup_logger",
    "LoggerWriter",
    "AverageMeter",
    "set_random_seed",
]
