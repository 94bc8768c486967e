"""SegResNet — Myronenko 2018 ("3D MRI brain tumor segmentation using
autoencoder regularization", BraTS 2018 winner; public method) without the
VAE branch, as MONAI ships it by default.

Capability addition beyond the reference's model zoo (its seg models are the
MONAI UNet subclass, reference src/models/unet.py:14-69, and the midfusion
variant): an asymmetric residual encoder-decoder that is the de-facto
standard strong baseline for BraTS-style tasks —

  - stem conv to ``init_filters``; encoder stages double channels with a
    stride-2 conv then ``blocks_down[i]`` PRE-ACTIVATION residual blocks
    (GroupNorm -> act -> conv, twice, identity add)
  - decoder stages halve channels with a 1x1x1 conv, upsample nearest 2x,
    ADD the encoder skip (cheaper than UNet's concat: no channel growth on
    the high-resolution path), then ``blocks_up`` residual blocks
  - final norm -> act -> 1x1x1 fp32 head

TPU-first: NDHWC throughout, bf16 compute / fp32 params + head, optional
``jax.checkpoint`` on the highest-resolution stages (same remat policy as
models/unet3d.py), activations sharding-constrained for the mesh space axis.
Plugs into the seg/TTA engine unchanged: GroupNorm's 1-D scale/bias match
the structural norm-param rule (tta/tent.py norm_param_mask), so Tent
adapts it out of the box.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import register_model
from ..utils.config import get_config
from .layers import Norm, get_act


class PreActResBlock(nn.Module):
    """norm -> act -> conv3 -> norm -> act -> conv3, identity add."""

    features: int
    norm: str = "GROUP"
    act: str = "RELU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        act = get_act(self.act)
        y = Norm(self.norm, dtype=self.dtype, name="n0")(x, train=train)
        y = act(y)
        y = nn.Conv(self.features, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv0")(y)
        y = Norm(self.norm, dtype=self.dtype, name="n1")(y, train=train)
        y = act(y)
        y = nn.Conv(self.features, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        from ..parallel.mesh import constrain_activations

        return constrain_activations(x + y)


@register_model("segresnet")
class SegResNet(nn.Module):
    in_channels: int = 2
    num_classes: int = 1
    init_filters: int = 16
    blocks_down: Sequence[int] = (1, 2, 2, 4)
    blocks_up: Sequence[int] = (1, 1, 1)
    norm: str = "GROUP"
    act: str = "RELU"
    dropout: float = 0.0
    dtype: Any = jnp.float32
    remat: Any = False  # False | True (all stages) | int (n highest-res stages)

    @classmethod
    def from_config(cls, cfg, **overrides) -> "SegResNet":
        kw = dict(
            in_channels=int(get_config(cfg, "in_channels", 2)),
            num_classes=int(get_config(cfg, "num_classes", 1)),
            init_filters=int(get_config(cfg, "init_filters", 16)),
            blocks_down=tuple(int(b) for b in get_config(cfg, "blocks_down", [1, 2, 2, 4])),
            blocks_up=tuple(int(b) for b in get_config(cfg, "blocks_up", [1, 1, 1])),
            norm=str(get_config(cfg, "norm", "GROUP")),
            act=str(get_config(cfg, "act", "RELU")),
            dropout=float(get_config(cfg, "dropout", 0.0)),
        )
        kw.update(overrides)
        if len(kw["blocks_up"]) != len(kw["blocks_down"]) - 1:
            raise ValueError(
                f"len(blocks_up)={len(kw['blocks_up'])} must equal "
                f"len(blocks_down)-1={len(kw['blocks_down']) - 1}"
            )
        return cls(**kw)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """x: [B, D, H, W, C_in] -> logits [B, D, H, W, num_classes]."""
        if x.shape[-1] != self.in_channels:
            raise ValueError(
                f"SegResNet expects {self.in_channels} input channels, got {x.shape[-1]}"
            )
        n_stages = len(self.blocks_down)
        total_stride = 2 ** (n_stages - 1)
        for ax, dim in enumerate(x.shape[1:4]):
            if dim % total_stride != 0:
                raise ValueError(
                    f"SegResNet spatial dim {ax} = {dim} must be divisible by "
                    f"{total_stride} ({n_stages} stages)"
                )
        x = x.astype(self.dtype)

        remat_stages = n_stages if self.remat is True else int(self.remat or 0)

        def run(blk, h, stage):
            if stage < remat_stages:
                return nn.remat(lambda mdl, a: mdl(a, train=train))(blk, h)
            return blk(h, train=train)

        h = nn.Conv(self.init_filters, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout, deterministic=not train, name="drop")(h)

        # ---- encoder ----
        skips = []
        for i, n_blocks in enumerate(self.blocks_down):
            feat = self.init_filters * (2**i)
            if i > 0:
                h = nn.Conv(feat, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                            use_bias=False, dtype=self.dtype, name=f"down{i}")(h)
            for b in range(n_blocks):
                h = run(
                    PreActResBlock(feat, norm=self.norm, act=self.act,
                                   dtype=self.dtype, name=f"enc{i}_{b}"),
                    h, i,
                )
            skips.append(h)

        # ---- decoder (additive skips) ----
        for j, n_blocks in enumerate(self.blocks_up):
            i = n_stages - 1 - j  # stage being upsampled FROM
            feat = self.init_filters * (2 ** (i - 1))
            h = nn.Conv(feat, (1, 1, 1), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"up_proj{i}")(h)
            h = jnp.repeat(jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2), 2, axis=3)
            h = h + skips[i - 1]
            for b in range(n_blocks):
                h = run(
                    PreActResBlock(feat, norm=self.norm, act=self.act,
                                   dtype=self.dtype, name=f"dec{i}_{b}"),
                    h, i - 1,
                )

        h = Norm(self.norm, dtype=self.dtype, name="final_norm")(h, train=train)
        h = get_act(self.act)(h)
        logits = nn.Conv(self.num_classes, (1, 1, 1), padding="SAME",
                         dtype=jnp.float32, name="head")(h.astype(jnp.float32))
        return logits
