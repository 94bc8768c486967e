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
from .resnet import ResNet, get_resnet_model  # noqa: F401 (registers resnet18..152)
from .densenet import DenseNet  # noqa: F401 (registers densenet121..161)
from .vit import ViT, get_vit_model  # noqa: F401 (registers vit_b_16..h_14)
from .efficientnet import EfficientNet  # noqa: F401 (registers efficientnet_b0..v2_l)
from .mogvae import VAEDeltaMoG  # noqa: F401 (registers vae_delta_mog)
from .unet3d_ws import UNet3DWS  # noqa: F401 (registers unet_ws, experimental)
from .unetr import UNETR  # noqa: F401 (registers unetr)
from .swin_unetr import SwinUNETR  # noqa: F401 (registers swin_unetr)
from .segresnet import SegResNet  # noqa: F401 (registers segresnet)
from .unet_multimodal_latefusion import MultimodalUNetLateFusion  # noqa: F401 (registers unet_multimodal_late/_mid)

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
