"""DenseNet classifier family (2D, NHWC).

Registry parity with the reference's torchvision wrappers (reference:
src/models/densenet.py:39-181; names densenet121/169/201/161). Forward
returns ``(pooled_features, logits)`` like the reference wrapper.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..registry import register_model
from ..utils.config import get_config
from .resnet import _VariantFactory

_SPECS = {
    # (growth_rate, block_config, init_features)
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
}


class DenseLayer(nn.Module):
    growth_rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(4 * self.growth_rate, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), (2, 2))


class DenseNet(nn.Module):
    variant: str = "densenet121"
    num_classes: int = 1000
    dtype: Any = jnp.float32
    # explicit topology overrides (default: looked up from _SPECS by variant;
    # settable so tests can build tiny torch-naming-compatible configs)
    growth_rate: Any = None
    block_config: Any = None
    init_features: Any = None

    @classmethod
    def from_config(cls, cfg, **overrides):
        kw = dict(
            variant=str(get_config(cfg, "name", "densenet121")),
            num_classes=int(get_config(cfg, "num_classes", 1000)),
        )
        kw.update(overrides)
        kw.pop("remat", None)
        return cls(**kw)

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        growth, blocks, init_feat = _SPECS[self.variant]
        growth = self.growth_rate if self.growth_rate is not None else growth
        blocks = tuple(self.block_config) if self.block_config is not None else blocks
        init_feat = self.init_features if self.init_features is not None else init_feat
        x = x.astype(self.dtype)
        x = nn.Conv(init_feat, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        feat = init_feat
        for bi, n_layers in enumerate(blocks):
            for li in range(n_layers):
                x = DenseLayer(growth, dtype=self.dtype, name=f"block{bi}_layer{li}")(x, train=train)
            feat = feat + n_layers * growth
            if bi != len(blocks) - 1:
                feat = feat // 2
                x = Transition(feat, dtype=self.dtype, name=f"transition{bi}")(x, train=train)

        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="final_bn")(x)
        x = nn.relu(x)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(self.num_classes, name="classifier")(pooled)
        return pooled, logits


for _name in _SPECS:
    register_model(_name)(_VariantFactory(DenseNet, _name))
