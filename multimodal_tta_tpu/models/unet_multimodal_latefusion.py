"""Late-fusion multimodal UNet.

The reference ships config files for fusion variants it never registers
("unet_multimodal_mid", "unet_multimodal_late" — reference:
configs/model/unet_multimodal_mid.yaml / unet_multimodal_late.yaml, SURVEY.md
§2.4). This module makes those names real:

  - "unet_multimodal_late": one full per-modality UNet3D tower per modality,
    fused at the very end by averaging logits (the classic late-fusion
    ensemble over modalities)
  - "unet_multimodal_mid" registers as an alias of the mid-fusion model,
    matching that config file's documented intent
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import register_model
from ..utils.config import get_config
from .unet3d import UNet3D
from .unet_multimodal_midfusion import MultimodalUNetMidFusion

# alias: "mid" is the residual bottleneck-fusion model
register_model("unet_multimodal_mid")(MultimodalUNetMidFusion)


@register_model("unet_multimodal_late")
@register_model("unet_multimodal_latefusion")
class MultimodalUNetLateFusion(nn.Module):
    num_modalities: int = 4
    num_classes: int = 3
    channels: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (2, 2, 2, 2)
    num_res_units: int = 2
    act: str = "RELU"
    norm: str = "INSTANCE"
    dropout: float = 0.0
    dtype: Any = jnp.float32
    remat: Any = False

    @classmethod
    def from_config(cls, cfg, **overrides) -> "MultimodalUNetLateFusion":
        kw = dict(
            num_modalities=int(get_config(cfg, "num_modalities", 4)),
            num_classes=int(get_config(cfg, "num_classes", 3)),
            channels=tuple(int(c) for c in get_config(cfg, "channels", [32, 64, 128, 256, 512])),
            strides=tuple(int(s) for s in get_config(cfg, "strides", [2, 2, 2, 2])),
            num_res_units=int(get_config(cfg, "num_res_units", 2)),
            act=str(get_config(cfg, "act", "RELU")),
            norm=str(get_config(cfg, "norm", "INSTANCE")),
            dropout=float(get_config(cfg, "dropout", 0.0)),
        )
        kw.update(overrides)
        return cls(**kw)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """x: [B, D, H, W, M] -> averaged logits [B, D, H, W, num_classes]."""
        if x.shape[-1] != self.num_modalities:
            raise ValueError(
                f"Expected {self.num_modalities} modalities, got {x.shape[-1]} channels"
            )
        logits = None
        for m in range(self.num_modalities):
            tower = UNet3D(
                in_channels=1,
                num_classes=self.num_classes,
                channels=self.channels,
                strides=self.strides,
                num_res_units=self.num_res_units,
                act=self.act,
                norm=self.norm,
                dropout=self.dropout,
                dtype=self.dtype,
                remat=self.remat,
                name=f"tower{m}",
            )
            out = tower(x[..., m : m + 1], train=train)
            logits = out if logits is None else logits + out
        return logits / self.num_modalities
