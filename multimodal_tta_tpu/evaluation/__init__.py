from .seg_eval import SegmentationEvaluationStrategy  # noqa: F401 (registers "seg_eval")

__all__ = ["SegmentationEvaluationStrategy"]
