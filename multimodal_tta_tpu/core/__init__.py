from .experiment_manager import ExperimentManager  # noqa: F401
from .train_state import TrainState, param_count  # noqa: F401
from .trainer_base import HookBase, TrainerBase  # noqa: F401
from .trainers.seg_trainer import SegTrainer  # noqa: F401

__all__ = ["ExperimentManager", "TrainState", "param_count", "HookBase", "TrainerBase", "SegTrainer"]
