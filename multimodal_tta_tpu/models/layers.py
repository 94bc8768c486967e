"""Shared flax building blocks for 3D segmentation models.

Equivalent capability to the MONAI blocks the reference builds on
(Convolution / ResidualUnit / UpSample — reference:
src/models/unet_multimodal_midfusion.py:8, src/models/unet.py:7), redesigned
for TPU:

  - channels-LAST (NDHWC) so XLA maps convs onto the MXU without transposes
  - norm/act selected by the same config strings ("INSTANCE"/"BATCH",
    "RELU"/"PRELU"/...)
  - instance norm = GroupNorm with one channel per group (stateless — the
    right default for TTA); batch norm carries running stats in the
    ``batch_stats`` collection for norm-statistic adaptation
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec

Dtype = Any


def get_act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    name = str(name).upper()
    table = {
        "RELU": nn.relu,
        "LEAKYRELU": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "PRELU": nn.relu,  # parametric slope handled by PReLU module below when requested
        "GELU": nn.gelu,
        "SILU": nn.silu,
        "SWISH": nn.silu,
        "TANH": nn.tanh,
        "SIGMOID": nn.sigmoid,
        "ELU": nn.elu,
    }
    if name not in table:
        raise ValueError(f"Unknown activation '{name}'. Known: {sorted(table)}")
    return table[name]


class InstanceNorm(nn.Module):
    """Per-sample per-channel normalization over the spatial dims (equivalent
    to GroupNorm with one channel per group — the reference's "INSTANCE" mode).

    Implemented manually rather than via ``nn.GroupNorm`` so the
    ``[B,1,..,1,C]`` statistic tensors can carry explicit sharding
    constraints: on a data×space mesh the activations enter sharded
    (batch→data, depth→space), and without a pin XLA's SPMD partitioner
    assigns the stats batch-over-data in the forward but dim1-over-space in
    the backward transpose, falling back to "involuntary full
    rematerialization" (replicate-then-repartition) inside ``jit(adapt)`` —
    wasted ICI/HBM traffic on the hot serving path. Pinning mean/var to
    batch-over-data keeps both passes on one layout (constraints are no-ops
    off-mesh). Same param names/shapes as GroupNorm (1-D ``scale``/``bias``),
    so checkpoints and the TTA norm-param structural mask are unchanged.
    """

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..parallel.mesh import DATA_AXIS, constrain, constrain_activations

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        red = tuple(range(1, x.ndim - 1))
        pin = PartitionSpec(*((DATA_AXIS,) + (None,) * (x.ndim - 1)))
        xf = x.astype(jnp.float32)
        mean = constrain(jnp.mean(xf, axis=red, keepdims=True), pin)
        mean2 = constrain(jnp.mean(jnp.square(xf), axis=red, keepdims=True), pin)
        var = constrain(jnp.maximum(mean2 - jnp.square(mean), 0.0), pin)
        inv = constrain(jax.lax.rsqrt(var + self.epsilon), pin)
        y = (xf - mean) * inv
        y = y * scale + bias
        return constrain_activations(y.astype(self.dtype or x.dtype))


class Norm(nn.Module):
    """Config-string-selected normalization over the channel (last) axis."""

    kind: str = "INSTANCE"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        kind = str(self.kind).upper()
        if kind == "INSTANCE":
            return InstanceNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if kind == "BATCH":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="norm",
            )(x)
        if kind == "GROUP":
            # 8 groups (the MONAI/SegResNet default) when it divides the
            # channel count, else the largest divisor of 8 that does — narrow
            # stages (tiny test models, stems) would otherwise be
            # unconstructible. Param shapes (per-channel scale/bias) are
            # unaffected by the group count.
            import math

            groups = math.gcd(8, x.shape[-1])
            return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if kind == "LAYER":
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if kind in ("NONE", ""):
            return x
        raise ValueError(f"Unknown norm '{self.kind}'")


def _triple(v: Union[int, Sequence[int]]) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    if len(t) != 3:
        raise ValueError(f"Expected 3 spatial dims, got {v}")
    return t


class ConvBlock(nn.Module):
    """Conv3D -> Norm -> Act (a MONAI ``Convolution``-style unit)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    norm: str = "INSTANCE"
    act: str = "RELU"
    dropout: float = 0.0
    use_norm: bool = True
    use_act: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            features=self.features,
            kernel_size=_triple(self.kernel_size),
            strides=_triple(self.strides),
            padding="SAME",
            use_bias=not self.use_norm,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_norm:
            x = Norm(self.norm, dtype=self.dtype, name="n")(x, train=train)
        if self.use_act:
            x = get_act(self.act)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train, name="drop")(x)
        from ..parallel.mesh import constrain_activations

        return constrain_activations(x)


class ResidualUnit(nn.Module):
    """Residual unit: ``subunits`` ConvBlocks (first carries the stride) plus a
    strided 1x1x1 projection residual when shape changes. Mirrors the structure
    the reference gets from monai.networks.blocks.ResidualUnit."""

    features: int
    strides: Union[int, Sequence[int]] = 1
    kernel_size: Union[int, Sequence[int]] = 3
    subunits: int = 2
    norm: str = "INSTANCE"
    act: str = "RELU"
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        strides = _triple(self.strides)
        needs_proj = any(s != 1 for s in strides) or x.shape[-1] != self.features

        res = x
        if needs_proj:
            res = nn.Conv(
                features=self.features,
                kernel_size=(1, 1, 1),
                strides=strides,
                padding="SAME",
                use_bias=True,
                dtype=self.dtype,
                name="residual_proj",
            )(x)

        y = x
        n_sub = max(1, int(self.subunits))
        for i in range(n_sub):
            y = ConvBlock(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=self.strides if i == 0 else 1,
                norm=self.norm,
                act=self.act,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"unit{i}",
            )(y, train=train)
        from ..parallel.mesh import constrain_activations

        return constrain_activations(y + res)


class UpSample(nn.Module):
    """Nearest-neighbor upsample by integer scale (the reference decoder's
    'nontrainable' UpSample mode — unet_multimodal_midfusion.py:114-120),
    followed by a channel-matching 1x1x1 conv when features differ."""

    features: int
    scale: Union[int, Sequence[int]] = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sd, sh, sw = _triple(self.scale)
        if (sd, sh, sw) != (1, 1, 1):
            b, d, h, w, c = x.shape
            x = jnp.repeat(x, sd, axis=1)
            x = jnp.repeat(x, sh, axis=2)
            x = jnp.repeat(x, sw, axis=3)
        if x.shape[-1] != self.features:
            x = nn.Conv(
                features=self.features,
                kernel_size=(1, 1, 1),
                padding="SAME",
                dtype=self.dtype,
                name="proj",
            )(x)
        from ..parallel.mesh import constrain_activations

        return constrain_activations(x)


class TransposedConvUp(nn.Module):
    """Strided transposed-conv upsampling (the MONAI UNet up path)."""

    features: int
    strides: Union[int, Sequence[int]] = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = _triple(self.strides)
        y = nn.ConvTranspose(
            features=self.features,
            kernel_size=s,
            strides=s,
            padding="VALID",
            dtype=self.dtype,
            name="up",
        )(x)
        from ..parallel.mesh import constrain_activations

        return constrain_activations(y)
