"""Vision Transformer classifier family (2D, NHWC).

Registry parity with the reference's torchvision ViT wrappers (reference:
src/models/vit.py:59-263; names vit_b_16/b_32/l_16/l_32/h_14). The reference
wrapper extracts the CLS token before the head and returns (features, logits)
(vit.py:150-161) — same contract here.

TPU-first: attention and MLP in the configured compute dtype; sequence length
is static (fixed image_size // patch). Long token sequences shard over the
mesh ``space`` axis (sequence parallelism): set ``seq_shard_axis="space"`` and
run under ``jax.set_mesh`` — the token axis is pinned to the space axis with
sharding constraints and XLA's SPMD partitioner inserts the attention
collectives (K/V all-gathers ride ICI). Single-chip / no-mesh runs degrade to
the unconstrained layout automatically.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec

from ..registry import register_model
from ..utils.config import get_config
from .resnet import _VariantFactory


from ..parallel.mesh import ambient_axes as _ambient_axes


_seq_shard_warned: set = set()


def _maybe_shard_seq(x: jnp.ndarray, axis: Optional[str]) -> jnp.ndarray:
    """Constrain [B, N, H] tokens to shard N over mesh axis ``axis`` when an
    ambient mesh carrying that axis exists; no-op otherwise (including the
    legacy-mesh case where N (patches + CLS) isn't divisible by the axis —
    the constraint would be a hard error there)."""
    if not axis:
        return x
    info = _ambient_axes().get(axis)
    if info is None:
        # explicit config with no matching mesh axis: degrade, but say so
        # once — otherwise sequence parallelism can silently disable (e.g.
        # after a jax upgrade changes the ambient-mesh introspection).
        if axis not in _seq_shard_warned:
            _seq_shard_warned.add(axis)
            from ..utils.logger import get_logger

            get_logger().warning(
                f"[vit] seq_shard_axis={axis!r} is set but no ambient mesh "
                f"carries that axis — sequence parallelism disabled for this "
                f"trace (run under `with mesh:` / jax.set_mesh)"
            )
        return x
    size, strict = info
    if strict and x.shape[1] % size != 0:
        return x
    return jax.lax.with_sharding_constraint(x, PartitionSpec(None, axis, None))

_SPECS = {
    # (patch, hidden, depth, heads, mlp_dim)
    "vit_b_16": (16, 768, 12, 12, 3072),
    "vit_b_32": (32, 768, 12, 12, 3072),
    "vit_l_16": (16, 1024, 24, 16, 4096),
    "vit_l_32": (32, 1024, 24, 16, 4096),
    "vit_h_14": (14, 1280, 32, 16, 5120),
}


def _maybe_shard_heads(x: jnp.ndarray, axis: Optional[str]) -> jnp.ndarray:
    """Constrain [B, N, heads, head_dim] to shard heads over mesh axis
    ``axis`` (tensor parallelism); graceful no-op without a matching mesh."""
    if not axis:
        return x
    from ..parallel.mesh import constrain

    return constrain(x, PartitionSpec(None, None, axis, None))


class SelfAttention(nn.Module):
    """Multi-head self-attention with the exact param tree of
    ``nn.MultiHeadDotProductAttention`` (query/key/value DenseGeneral
    [H, heads, hd] + out DenseGeneral [heads, hd, H] — ported torchvision
    checkpoints load unchanged), hand-rolled so tensor parallelism can pin
    the head dimension to a mesh axis: with ``tp_axis="model"`` the q/k/v
    projections, the attention einsums, and the context tensor all shard
    over heads (Megatron-style — each device computes its head group; the
    only collective is the reduce XLA inserts for the out-projection)."""

    hidden: int
    heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.hidden % self.heads:
            raise ValueError(f"hidden {self.hidden} not divisible by heads {self.heads}")
        hd = self.hidden // self.heads
        proj = lambda name: nn.DenseGeneral(  # noqa: E731
            features=(self.heads, hd), axis=-1, dtype=self.dtype, name=name
        )
        q = _maybe_shard_heads(proj("query")(x), self.tp_axis)
        k = _maybe_shard_heads(proj("key")(x), self.tp_axis)
        v = _maybe_shard_heads(proj("value")(x), self.tp_axis)
        q = q / jnp.sqrt(jnp.asarray(hd, q.dtype))
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        attn = jax.nn.softmax(attn, axis=-1)
        if self.dropout > 0.0:
            attn = nn.Dropout(rate=self.dropout)(attn, deterministic=not train)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        ctx = _maybe_shard_heads(ctx, self.tp_axis)
        return nn.DenseGeneral(
            features=self.hidden, axis=(-2, -1), dtype=self.dtype, name="out"
        )(ctx)


class EncoderBlock(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    tp_axis: Optional[str] = None  # mesh axis for tensor parallelism
    # Mixture-of-Experts FFN (models/moe.py): when num_experts > 0 the dense
    # MLP is replaced by a top-k routed expert layer, expert-parallel over
    # the mesh ``expert`` axis. Param tree is unchanged when 0 (default), so
    # pre-MoE checkpoints/porters load exactly as before.
    num_experts: int = 0
    moe_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_axis: Optional[str] = "expert"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        # name pinned to flax's auto-name so pre-TP checkpoints/porters load
        y = SelfAttention(
            self.hidden, self.heads, self.dropout, dtype=self.dtype,
            tp_axis=self.tp_axis, name="MultiHeadDotProductAttention_0",
        )(y, train=train)
        x = x + y
        if self.num_experts > 0:
            from .moe import MoEMlp

            y = MoEMlp(
                hidden=self.hidden,
                mlp_dim=self.mlp_dim,
                num_experts=self.num_experts,
                k=self.moe_k,
                capacity_factor=self.moe_capacity_factor,
                expert_axis=self.moe_axis,
                dtype=self.dtype,
                name="moe",
            )(nn.LayerNorm(dtype=self.dtype)(x), train=train)
            return x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype)(y)
        if self.tp_axis:
            from ..parallel.mesh import constrain

            # Megatron MLP split: hidden features over the model axis — the
            # two Dense matmuls each run 1/tp of the FLOPs per device and the
            # second one reduce-scatters/all-reduces back to the full H.
            y = constrain(y, PartitionSpec(None, None, self.tp_axis))
        # exact (erf) GELU — torchvision's default; the tanh approximation
        # would break ported-weight forward parity at the 1e-3 level
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden, dtype=self.dtype)(y)
        return x + y


class ViT(nn.Module):
    variant: str = "vit_b_16"
    num_classes: int = 1000
    image_size: int = 224
    dropout: float = 0.0
    dtype: Any = jnp.float32
    seq_shard_axis: Optional[str] = None  # mesh axis for sequence parallelism
    tp_axis: Optional[str] = None  # mesh axis for tensor (head/MLP) parallelism
    # MoE encoder FFNs (models/moe.py; expert-parallel over the mesh
    # ``expert`` axis): every moe_every-th block routes to moe_experts experts
    moe_experts: int = 0
    moe_every: int = 2
    moe_k: int = 1
    moe_capacity_factor: float = 1.25
    # explicit topology overrides (default: from _SPECS by variant; settable
    # so tests can build tiny torchvision-naming-compatible configs)
    patch: Optional[int] = None
    hidden: Optional[int] = None
    depth: Optional[int] = None
    heads: Optional[int] = None
    mlp_dim: Optional[int] = None

    @classmethod
    def from_config(cls, cfg, **overrides):
        kw = dict(
            variant=str(get_config(cfg, "name", "vit_b_16")),
            num_classes=int(get_config(cfg, "num_classes", 1000)),
            image_size=int(get_config(cfg, "image_size", 224)),
            dropout=float(get_config(cfg, "dropout", 0.0)),
            seq_shard_axis=get_config(cfg, "seq_shard_axis", None),
            tp_axis=get_config(cfg, "tp_axis", None),
            moe_experts=int(get_config(cfg, "moe_experts", 0)),
            moe_every=int(get_config(cfg, "moe_every", 2)),
            moe_k=int(get_config(cfg, "moe_k", 1)),
            moe_capacity_factor=float(get_config(cfg, "moe_capacity_factor", 1.25)),
        )
        kw.update(overrides)
        kw.pop("remat", None)
        return cls(**kw)

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        patch, hidden, depth, heads, mlp_dim = _SPECS[self.variant]
        patch = self.patch if self.patch is not None else patch
        hidden = self.hidden if self.hidden is not None else hidden
        depth = self.depth if self.depth is not None else depth
        heads = self.heads if self.heads is not None else heads
        mlp_dim = self.mlp_dim if self.mlp_dim is not None else mlp_dim
        b, h, w, c = x.shape
        if h % patch or w % patch:
            raise ValueError(f"ViT input {h}x{w} not divisible by patch {patch}")
        x = x.astype(self.dtype)

        x = nn.Conv(hidden, (patch, patch), (patch, patch), padding="VALID", dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, -1, hidden)  # [B, N, H]

        cls_tok = self.param("cls_token", nn.initializers.zeros, (1, 1, hidden))
        x = jnp.concatenate([jnp.tile(cls_tok.astype(self.dtype), (b, 1, 1)), x], axis=1)
        n = x.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n, hidden))
        x = x + pos.astype(self.dtype)

        x = _maybe_shard_seq(x, self.seq_shard_axis)
        for i in range(depth):
            is_moe = self.moe_experts > 0 and (i % self.moe_every) == self.moe_every - 1
            x = EncoderBlock(
                hidden, heads, mlp_dim, self.dropout, dtype=self.dtype,
                tp_axis=self.tp_axis,
                num_experts=self.moe_experts if is_moe else 0,
                moe_k=self.moe_k, moe_capacity_factor=self.moe_capacity_factor,
                name=f"block{i}",
            )(x, train=train)
            x = _maybe_shard_seq(x, self.seq_shard_axis)

        x = nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)
        cls = x[:, 0].astype(jnp.float32)  # CLS token features
        logits = nn.Dense(self.num_classes, name="head")(cls)
        return cls, logits


for _name in _SPECS:
    register_model(_name)(_VariantFactory(ViT, _name))


def get_vit_model(name: str, **kw) -> ViT:
    if name not in _SPECS:
        raise ValueError(f"Unknown vit variant: {name}")
    return ViT(variant=name, **kw)
