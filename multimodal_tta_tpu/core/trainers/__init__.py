from .seg_trainer import SegTrainer  # noqa: F401

__all__ = ["SegTrainer"]
