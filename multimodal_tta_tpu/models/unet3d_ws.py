"""UNet3D-WS: wide-stem (space-to-depth) UNet variant — EXPERIMENTAL.

Profiling (scripts/profile_top_ops.py) shows the stock UNet3D is bounded by
its highest-resolution convs, whose tiny channel counts (2->32) underfill the
TPU's 128-wide lanes. This variant trades them away:

  - stem: 2x2x2 space-to-depth packs the input to half resolution with 8x the
    channels (2ch -> 16ch at [D/2,H/2,W/2]) before any convolution
  - body: the standard residual UNet topology runs entirely at >= half
    resolution (strides shortened by one level, same channel ladder)
  - head: predicts 8*num_classes at half resolution and depth-to-space
    unpacks to full-resolution logits

Registered as "unet_ws" — a NEW name; "unet" remains the topology-parity
model. Same config keys.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import register_model
from ..utils.config import get_config
from .layers import ConvBlock, ResidualUnit, TransposedConvUp


def space_to_depth_3d(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[B,D,H,W,C] -> [B,D/r,H/r,W/r,C*r^3]."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // r, r, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // r, h // r, w // r, c * r ** 3)


def depth_to_space_3d(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[B,D,H,W,C*r^3] -> [B,D*r,H*r,W*r,C]."""
    b, d, h, w, cr = x.shape
    c = cr // r ** 3
    x = x.reshape(b, d, h, w, r, r, r, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d * r, h * r, w * r, c)


@register_model("unet_ws")
class UNet3DWS(nn.Module):
    in_channels: int = 2
    num_classes: int = 1
    channels: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (2, 2, 2, 2)
    num_res_units: int = 2
    act: str = "RELU"
    norm: str = "INSTANCE"
    dropout: float = 0.0
    dtype: Any = jnp.float32
    remat: Any = False

    @classmethod
    def from_config(cls, cfg, **overrides) -> "UNet3DWS":
        kw = dict(
            in_channels=int(get_config(cfg, "in_channels", 2)),
            num_classes=int(get_config(cfg, "num_classes", 1)),
            channels=tuple(int(c) for c in get_config(cfg, "channels", [32, 64, 128, 256, 512])),
            strides=tuple(int(s) for s in get_config(cfg, "strides", [2, 2, 2, 2])),
            num_res_units=int(get_config(cfg, "num_res_units", 2)),
            act=str(get_config(cfg, "act", "RELU")),
            norm=str(get_config(cfg, "norm", "INSTANCE")),
            dropout=float(get_config(cfg, "dropout", 0.0)),
        )
        kw.update(overrides)
        return cls(**kw)

    def _block(self, feat: int, stride: int, name: str):
        return ResidualUnit(
            features=feat,
            strides=stride,
            subunits=max(1, self.num_res_units),
            norm=self.norm,
            act=self.act,
            dropout=self.dropout,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.shape[-1] != self.in_channels:
            raise ValueError(f"UNet3DWS expects {self.in_channels} channels, got {x.shape[-1]}")
        for ax, dim in enumerate(x.shape[1:4]):
            if dim % (2 * 2 ** (len(self.strides) - 1)) != 0:
                raise ValueError(f"spatial dim {ax}={dim} not divisible for the WS stem + strides")
        x = x.astype(self.dtype)

        # ---- wide stem: input itself becomes the half-res representation ----
        h = space_to_depth_3d(x, 2)                       # [B,D/2,H/2,W/2,8C]
        chs = list(self.channels)
        sts = list(self.strides)[1:]                      # stem consumed one 2x level
        n_levels = len(sts)

        h = self._block(chs[0], 1, "stem")(h, train=train)  # 8C -> 32 at half res

        skips = [h]
        for i in range(n_levels):
            h = self._block(chs[i + 1], sts[i], f"enc{i}")(h, train=train)
            skips.append(h)

        h = self._block(chs[-1], 1, "bottleneck")(h, train=train)

        for i in reversed(range(n_levels)):
            h = TransposedConvUp(features=chs[i + 1], strides=sts[i], dtype=self.dtype, name=f"up{i}")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = self._block(chs[i + 1], 1, f"dec{i}")(h, train=train)

        # ---- head: 8*num_classes at half res, unpacked to full res ----
        logits_p = nn.Conv(
            features=self.num_classes * 8,
            kernel_size=(1, 1, 1),
            padding="SAME",
            dtype=jnp.float32,
            name="head",
        )(h.astype(jnp.float32))
        return depth_to_space_3d(logits_p, 2)
