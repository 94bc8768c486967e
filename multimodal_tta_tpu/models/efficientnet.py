"""EfficientNet classifier family (2D, NHWC).

Registry parity with the reference's torchvision wrappers (reference:
src/models/efficientnet.py:57-289; names efficientnet_b0..b7 and v2_s/m/l).
MBConv (and FusedMBConv for v2) with squeeze-excitation; forward returns
``(pooled_features, logits)``.

Structure matches torchvision exactly so ImageNet state_dicts port
losslessly (models/pretrained.py:port_torch_efficientnet): explicit
symmetric (k-1)//2 paddings (XLA "SAME" pads stride-2 convs asymmetrically,
which silently breaks weight-ported forward parity), single-conv
FusedMBConv when expand==1, BatchNorm eps 1e-3 for the v2 variants, and the
v2 stem width taken from the first stage (32 for v2_l, 24 for v2_s/m).
"""

from __future__ import annotations

import math
from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..registry import register_model
from ..utils.config import get_config
from .resnet import _VariantFactory

# B0 baseline stage spec: (expand, channels, layers, stride, kernel)
_B0_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]
# (width_mult, depth_mult)
_B_SCALES = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
    "efficientnet_b5": (1.6, 2.2),
    "efficientnet_b6": (1.8, 2.6),
    "efficientnet_b7": (2.0, 3.1),
}
# v2: explicit stages (expand, channels, layers, stride, kernel, fused)
_V2_STAGES = {
    "efficientnet_v2_s": [
        (1, 24, 2, 1, 3, True),
        (4, 48, 4, 2, 3, True),
        (4, 64, 4, 2, 3, True),
        (4, 128, 6, 2, 3, False),
        (6, 160, 9, 1, 3, False),
        (6, 256, 15, 2, 3, False),
    ],
    "efficientnet_v2_m": [
        (1, 24, 3, 1, 3, True),
        (4, 48, 5, 2, 3, True),
        (4, 80, 5, 2, 3, True),
        (4, 160, 7, 2, 3, False),
        (6, 176, 14, 1, 3, False),
        (6, 304, 18, 2, 3, False),
        (6, 512, 5, 1, 3, False),
    ],
    "efficientnet_v2_l": [
        (1, 32, 4, 1, 3, True),
        (4, 64, 7, 2, 3, True),
        (4, 96, 7, 2, 3, True),
        (4, 192, 10, 2, 3, False),
        (6, 224, 19, 1, 3, False),
        (6, 384, 25, 2, 3, False),
        (6, 640, 7, 1, 3, False),
    ],
}


def _round_channels(c: float, mult: float, divisor: int = 8) -> int:
    c *= mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_layers(n: int, mult: float) -> int:
    return int(math.ceil(n * mult))


class SqueezeExcite(nn.Module):
    in_channels: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(max(1, int(self.in_channels * self.se_ratio)), (1, 1), dtype=self.dtype)(se)
        se = nn.silu(se)
        se = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(se)
        return x * nn.sigmoid(se)


def _sym_pad(kernel: int):
    """torch-style symmetric padding. XLA "SAME" puts the extra pad of a
    stride-2 conv on the high side; torch pads (k-1)//2 on BOTH sides, so
    ported weights see shifted inputs under "SAME" — same shapes, wrong
    values (the porter-parity blocker this replaces)."""
    p = (kernel - 1) // 2
    return [(p, p), (p, p)]


class MBConv(nn.Module):
    expand: int
    features: int
    strides: int
    kernel: int
    fused: bool = False
    dtype: Any = jnp.float32
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        residual = x
        mid = inp * self.expand
        k = (self.kernel, self.kernel)
        s = (self.strides, self.strides)

        def bn(y):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                epsilon=self.bn_eps, dtype=self.dtype,
            )(y)

        if self.fused and self.expand == 1:
            # torchvision FusedMBConv at expand=1: ONE k x k conv straight
            # to the output width, with activation — no separate projection
            x = nn.Conv(self.features, k, s, padding=_sym_pad(self.kernel),
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.silu(bn(x))
            if self.strides == 1 and inp == self.features:
                x = x + residual
            return x

        if self.fused:
            x = nn.Conv(mid, k, s, padding=_sym_pad(self.kernel),
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.silu(bn(x))
        else:
            if self.expand != 1:
                x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
                x = nn.silu(bn(x))
            x = nn.Conv(
                mid, k, s, padding=_sym_pad(self.kernel),
                feature_group_count=mid, use_bias=False, dtype=self.dtype,
            )(x)
            x = nn.silu(bn(x))
            x = SqueezeExcite(inp, dtype=self.dtype)(x)

        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = bn(x)
        if self.strides == 1 and inp == self.features:
            x = x + residual
        return x


class EfficientNet(nn.Module):
    variant: str = "efficientnet_b0"
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, **overrides):
        kw = dict(
            variant=str(get_config(cfg, "name", "efficientnet_b0")),
            num_classes=int(get_config(cfg, "num_classes", 1000)),
        )
        kw.update(overrides)
        kw.pop("remat", None)
        return cls(**kw)

    def _stages(self) -> List[Tuple[int, int, int, int, int, bool]]:
        if self.variant in _V2_STAGES:
            return _V2_STAGES[self.variant]
        wm, dm = _B_SCALES[self.variant]
        return [
            (e, _round_channels(c, wm), _round_layers(n, dm), s, k, False)
            for (e, c, n, s, k) in _B0_STAGES
        ]

    @property
    def bn_eps(self) -> float:
        # torchvision builds the v2 variants with BatchNorm eps=1e-3 and the
        # b-series with the default 1e-5; ported running stats need the same
        return 1e-3 if self.variant in _V2_STAGES else 1e-5

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        stages = self._stages()
        x = x.astype(self.dtype)
        # v2 stem width = first stage's input width (24 for v2_s/m, 32 for
        # v2_l — the first v2 stage is expand-1 fused, so in == out)
        stem = stages[0][1] if self.variant in _V2_STAGES else _round_channels(32, _B_SCALES[self.variant][0])
        x = nn.Conv(stem, (3, 3), (2, 2), padding=_sym_pad(3), use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.bn_eps, dtype=self.dtype, name="stem_bn")(x)
        x = nn.silu(x)

        for si, (e, c, n, s, k, fused) in enumerate(stages):
            for li in range(n):
                x = MBConv(
                    expand=e,
                    features=c,
                    strides=s if li == 0 else 1,
                    kernel=k,
                    fused=fused,
                    dtype=self.dtype,
                    bn_eps=self.bn_eps,
                    name=f"stage{si}_block{li}",
                )(x, train=train)

        head = 1280 if self.variant in _V2_STAGES else _round_channels(1280, _B_SCALES[self.variant][0])
        x = nn.Conv(head, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.bn_eps, dtype=self.dtype, name="head_bn")(x)
        x = nn.silu(x)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(self.num_classes, name="classifier")(pooled)
        return pooled, logits


for _name in list(_B_SCALES) + list(_V2_STAGES):
    register_model(_name)(_VariantFactory(EfficientNet, _name))
