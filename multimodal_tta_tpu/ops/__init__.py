from .augment import modality_dropout, rand_intensity_scale_shift, rand_rot90  # noqa: F401
from .intensity import make_intensity_normalizer, zscore_masked  # noqa: F401
from .losses import (  # noqa: F401
    dice_ce_loss,
    entropy_loss,
    focal_loss,
    make_criterion,
    make_dice_ce_loss,
    soft_dice_loss,
    triplet_margin_loss,
)
from .seg_metrics import binary_dice_iou, dice_iou_from_logits  # noqa: F401
from .sliding_window import sliding_window_inference  # noqa: F401
from .ssim import MS_SSIM, SSIM, ms_ssim, ssim  # noqa: F401
from .surface import batched_surface_metrics, squared_edt, surface_metrics_single  # noqa: F401

__all__ = [
    "modality_dropout",
    "rand_intensity_scale_shift",
    "rand_rot90",
    "make_intensity_normalizer",
    "zscore_masked",
    "dice_ce_loss",
    "entropy_loss",
    "focal_loss",
    "make_criterion",
    "make_dice_ce_loss",
    "soft_dice_loss",
    "triplet_margin_loss",
    "binary_dice_iou",
    "dice_iou_from_logits",
    "sliding_window_inference",
    "MS_SSIM",
    "SSIM",
    "ms_ssim",
    "ssim",
    "batched_surface_metrics",
    "squared_edt",
    "surface_metrics_single",
]
