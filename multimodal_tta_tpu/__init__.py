"""multimodal_tta_tpu — TPU-native multimodal segmentation + test-time adaptation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch/MONAI framework (zhm1205/Multimodal_TTA): 3D multimodal medical-image
segmentation under domain shift, with a first-class test-time-adaptation
engine, data-parallel scaling over TPU device meshes, and the reference's
config/registry/CLI surface preserved.

Package map:
  conf/        Hydra-compatible config composition (no external hydra needed)
  utils/       logging, meters, seeding, typed config accessors
  ops/         pure-jnp / Pallas compute: losses, metrics, normalization,
               resampling, surface distances, sliding-window inference
  data/        NIfTI IO, manifest parsing, datasets, host->device pipeline
  models/      flax.linen models (UNet3D, multimodal mid-fusion UNet, 2D
               classifier backbones) in NDHWC layout
  core/        train state, trainers, hooks, experiment manager
  evaluation/  segmentation evaluation strategies (Dice/IoU/HD95/ASD,
               overall + per-domain)
  tta/         test-time adaptation engine (Tent entropy minimization, norm
               statistic adaptation, continual mode)
  parallel/    device mesh construction and sharding helpers
"""

__version__ = "0.1.0"

from .registry import (  # noqa: F401
    MODELS,
    DATASETS,
    DATASET_BUILDERS,
    EVALUATION_STRATEGIES,
    CRITERIA,
    PROVIDERS,
    PLUGINS,
    TTA_METHODS,
    register_model,
    register_dataset,
    register_dataset_builder,
    register_evaluation_strategy,
    register_criterion,
    register_provider,
    register_plugin,
    register_tta_method,
    get_model,
    get_dataset,
    get_dataset_builder,
    get_evaluation_strategy,
    get_criterion,
    get_provider,
    get_plugin,
    get_tta_method,
    list_all_components,
)
from .utils import AverageMeter, get_logger, set_random_seed, setup_logger  # noqa: F401
