"""ResNet classifier family (2D, NHWC).

Registry parity with the reference's torchvision wrappers (reference:
src/models/resnet.py:40-243, registered names resnet18/34/50/101/152 in
src/models/__init__.py:33-60). These 2D backbones are not used by the 3D
segmentation workloads; they complete the model-registry surface (and the
ReID-style BNNeck head the reference wrapper offers).

Forward returns ``(pooled_features, logits)`` — the reference wrapper's
contract (resnet.py:130-161).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..registry import register_model
from ..utils.config import get_config


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    """x: [B,H,W,C] -> (features [B,F], logits [B,num_classes])."""

    variant: str = "resnet18"
    num_classes: int = 1000
    reid_mode: bool = False  # BNNeck + L2-normalized embedding head
    embedding_dim: int = 512
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, **overrides):
        kw = dict(
            variant=str(get_config(cfg, "name", "resnet18")),
            num_classes=int(get_config(cfg, "num_classes", 1000)),
            reid_mode=bool(get_config(cfg, "reid_mode", False)),
            embedding_dim=int(get_config(cfg, "embedding_dim", 512)),
        )
        kw.update(overrides)
        kw.pop("remat", None)
        return cls(**kw)

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        block_cls, stages = _SPECS[self.variant]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        feats = (64, 128, 256, 512)
        for i, (n_blocks, f) in enumerate(zip(stages, feats)):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = block_cls(features=f, strides=strides, dtype=self.dtype, name=f"layer{i + 1}_{j}")(x, train=train)

        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # [B,F]

        if self.reid_mode:
            emb = nn.Dense(self.embedding_dim, name="projection")(pooled)
            emb = nn.BatchNorm(use_running_average=not train, momentum=0.9, use_scale=True, use_bias=False, name="bnneck")(emb)
            logits = nn.Dense(self.num_classes, use_bias=False, name="fc")(emb)
            emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            return emb, logits

        logits = nn.Dense(self.num_classes, name="fc")(pooled)
        return pooled, logits


class _VariantFactory:
    """Registry adapter binding a concrete variant name to a model family.

    The registry contract only requires ``from_config(cfg, **overrides)``
    (see core/experiment_manager.py setup_model)."""

    def __init__(self, family, name: str):
        self.family = family
        self.name = name

    def from_config(self, cfg, **overrides):
        overrides["variant"] = self.name
        return self.family.from_config(cfg, **overrides)

    def __repr__(self):
        return f"<{self.family.__name__} variant '{self.name}'>"


for _name in _SPECS:
    register_model(_name)(_VariantFactory(ResNet, _name))


def get_resnet_model(name: str, **kw) -> ResNet:
    if name not in _SPECS:
        raise ValueError(f"Unknown resnet variant: {name}")
    return ResNet(variant=name, **kw)
