"""Model registry population.

Importing this package registers all model families under the same names as
the reference (reference: src/models/__init__.py:33-60), so
``get_model("unet")`` etc. resolve identically.
"""

from .layers import ConvBlock, ResidualUnit, UpSample, TransposedConvUp, Norm, get_act  # noqa: F401
from .unet3d import UNet3D  # noqa: F401
from .unet_multimodal_midfusion import (  # noqa: F401
    MultimodalUNetMidFusion,
    SpecificEncoder,
    CompositionalLayer,
    DecoderStage,
)

__all__ = [
    "ConvBlock",
    "ResidualUnit",
    "UpSample",
    "TransposedConvUp",
    "Norm",
    "get_act",
    "UNet3D",
    "MultimodalUNetMidFusion",
    "SpecificEncoder",
    "CompositionalLayer",
    "DecoderStage",
]
