"""UNETR — transformer-encoder 3D segmentation (Hatamizadeh et al., WACV 2022).

A beyond-reference model family: the reference ships only convolutional
UNets (reference: src/models/unet.py, src/models/unet_multimodal_midfusion.py);
UNETR replaces the conv encoder with a 3D ViT over non-overlapping volumetric
patches and decodes with a conv pyramid fed by token skips from intermediate
transformer layers. It is the standard transformer baseline for the same
medical segmentation workloads the framework targets (PAPERS.md).

TPU-first design:
  - NDHWC end to end; the patch embed is a strided Conv3D so the MXU sees
    one big matmul per patch grid, and every attention/MLP matmul runs in
    the configured compute dtype (bf16 by default) at a static token count.
  - Token skips reshape [B, N, H] -> [B, d, h, w, H] with d*h*w == N — a
    free layout change under XLA (no data movement off the happy path).
  - ``remat`` follows the UNet3D convention (True = everything, int n = the
    n highest-resolution decoder levels — in a 3D decoder the activation
    memory lives at full/half resolution, while the 243-token transformer
    is cheap to store).
  - Long token sequences shard over the mesh ``space`` axis exactly like
    models/vit.py (``seq_shard_axis="space"`` under an ambient mesh); the
    decoder convs inherit the framework's data x space activation pins from
    the shared ConvBlock/TransposedConvUp blocks.
  - Tensor parallelism: ``tp_axis="model"`` shards attention heads and the
    MLP hidden dimension over the mesh ``model`` axis (Megatron-style, via
    the shared EncoderBlock; see tests/test_tp.py).

Output contract matches UNet3D ([B, D, H, W, num_classes] fp32 logits), so
SegTrainer, seg_eval, sliding-window inference and every TTA method apply
unchanged; Tent's structural norm tagging picks up the encoder LayerNorms
and decoder InstanceNorms with no model-specific code.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import register_model
from ..utils.config import get_config
from .layers import ConvBlock, TransposedConvUp
from .vit import EncoderBlock, _maybe_shard_seq


def _deconv_conv_chain(
    tokens_3d: jnp.ndarray,
    *,
    stages: int,
    features: int,
    norm: str,
    act: str,
    dtype: Any,
    name: str,
    train: bool,
) -> jnp.ndarray:
    """Project a bottleneck-resolution token map up by 2x per stage.

    Each stage is transposed-conv upsampling followed by a 3x3x3
    conv/norm/act — the UNETR skip branch ("yellow/blue" blocks in the
    paper): the z3 branch runs 3 stages to reach R/2, z6 two to R/4, z9 one
    to R/8.
    """
    h = tokens_3d
    for s in range(stages):
        h = TransposedConvUp(features=features, strides=2, dtype=dtype, name=f"{name}_up{s}")(h)
        h = ConvBlock(
            features=features, norm=norm, act=act, dtype=dtype, name=f"{name}_conv{s}"
        )(h, train=train)
    return h


@register_model("unetr")
class UNETR(nn.Module):
    in_channels: int = 2
    num_classes: int = 1
    patch_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    feature_size: int = 16  # F: decoder channels are F, 2F, 4F, 8F
    norm: str = "INSTANCE"
    act: str = "RELU"
    dropout: float = 0.0
    dtype: Any = jnp.float32
    remat: Any = False  # False | True | int (n highest-res decoder levels)
    seq_shard_axis: Optional[str] = None
    tp_axis: Optional[str] = None  # mesh axis for tensor (head/MLP) parallelism
    # Mixture-of-Experts encoder FFNs (models/moe.py): every ``moe_every``-th
    # block swaps its dense MLP for ``moe_experts`` routed experts,
    # expert-parallel over the mesh ``expert`` axis (training.mesh.expert).
    moe_experts: int = 0
    moe_every: int = 2
    moe_k: int = 1
    moe_capacity_factor: float = 1.25

    @classmethod
    def from_config(cls, cfg, **overrides) -> "UNETR":
        kw = dict(
            in_channels=int(get_config(cfg, "in_channels", 2)),
            num_classes=int(get_config(cfg, "num_classes", 1)),
            patch_size=int(get_config(cfg, "patch_size", 16)),
            hidden_size=int(get_config(cfg, "hidden_size", 768)),
            mlp_dim=int(get_config(cfg, "mlp_dim", 3072)),
            num_heads=int(get_config(cfg, "num_heads", 12)),
            num_layers=int(get_config(cfg, "num_layers", 12)),
            feature_size=int(get_config(cfg, "feature_size", 16)),
            norm=str(get_config(cfg, "norm", "INSTANCE")),
            act=str(get_config(cfg, "act", "RELU")),
            dropout=float(get_config(cfg, "dropout", 0.0)),
            seq_shard_axis=get_config(cfg, "seq_shard_axis", None),
            tp_axis=get_config(cfg, "tp_axis", None),
            moe_experts=int(get_config(cfg, "moe_experts", 0)),
            moe_every=int(get_config(cfg, "moe_every", 2)),
            moe_k=int(get_config(cfg, "moe_k", 1)),
            moe_capacity_factor=float(get_config(cfg, "moe_capacity_factor", 1.25)),
        )
        kw.update(overrides)
        return cls(**kw)

    def _levels(self) -> int:
        lv = int(math.log2(self.patch_size))
        if 2 ** lv != self.patch_size or lv < 2:
            raise ValueError(
                f"UNETR patch_size must be a power of two >= 4, got {self.patch_size}"
            )
        return lv

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.shape[-1] != self.in_channels:
            raise ValueError(
                f"UNETR expects {self.in_channels} input channels, got {x.shape[-1]}"
            )
        levels = self._levels()  # bottleneck sits at R / 2^levels
        p = self.patch_size
        b, dd, hh, ww, _ = x.shape
        for ax, dim in enumerate((dd, hh, ww)):
            if dim % p != 0:
                raise ValueError(
                    f"UNETR spatial dim {ax} = {dim} must be divisible by patch_size={p}"
                )
        if self.num_layers % levels != 0:
            raise ValueError(
                f"num_layers={self.num_layers} must be divisible by {levels} "
                f"(one token skip every num_layers/{levels} layers)"
            )
        gd, gh, gw = dd // p, hh // p, ww // p
        x = x.astype(self.dtype)

        remat_levels = levels + 1 if self.remat is True else int(self.remat or 0)

        def run(blk, h, level):
            if level < remat_levels:
                return nn.remat(lambda mdl, a: mdl(a, train=train))(blk, h)
            return blk(h, train=train)

        # ---- 3D ViT encoder over p^3 patches ----
        tok = nn.Conv(
            features=self.hidden_size,
            kernel_size=(p, p, p),
            strides=(p, p, p),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        tok = tok.reshape(b, gd * gh * gw, self.hidden_size)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, tok.shape[1], self.hidden_size)
        )
        tok = tok + pos.astype(self.dtype)
        tok = _maybe_shard_seq(tok, self.seq_shard_axis)

        # token skips every num_layers/levels layers: after layer k*step the
        # sequence feeds the branch that decodes at R / 2^k (shallow tokens
        # carry the finest detail -> most-upsampled branch, paper Fig. 1)
        step = self.num_layers // levels
        skips_tok = {}
        for i in range(self.num_layers):
            is_moe = self.moe_experts > 0 and (i % self.moe_every) == self.moe_every - 1
            blk = EncoderBlock(
                self.hidden_size,
                self.num_heads,
                self.mlp_dim,
                self.dropout,
                dtype=self.dtype,
                tp_axis=self.tp_axis,
                num_experts=self.moe_experts if is_moe else 0,
                moe_k=self.moe_k,
                moe_capacity_factor=self.moe_capacity_factor,
                name=f"block{i}",
            )
            # transformer activations are tiny next to the decoder's; remat
            # them only under remat=True (full) via level index `levels`
            tok = run(blk, tok, levels)
            tok = _maybe_shard_seq(tok, self.seq_shard_axis)
            k = (i + 1) // step
            if (i + 1) % step == 0 and 1 <= k <= levels - 1:
                skips_tok[k] = tok
        ztop = nn.LayerNorm(dtype=self.dtype, name="encoder_ln")(tok)

        def to_3d(t: jnp.ndarray) -> jnp.ndarray:
            return t.reshape(b, gd, gh, gw, self.hidden_size)

        # ---- skip branches: tokens at R/2^levels -> conv maps at R/2^k ----
        feats = {k: self.feature_size * (2 ** k) for k in range(levels)}
        branches = {}
        for k in range(1, levels):
            branches[k] = _deconv_conv_chain(
                to_3d(skips_tok[k]),
                stages=levels - k,
                features=feats[k],
                norm=self.norm,
                act=self.act,
                dtype=self.dtype,
                name=f"skip{k}",
                train=train,
            )
        # full-resolution stem on the raw input (enc0 in the paper)
        stem = ConvBlock(
            features=feats[0], norm=self.norm, act=self.act, dtype=self.dtype, name="stem0"
        )
        stem2 = ConvBlock(
            features=feats[0], norm=self.norm, act=self.act, dtype=self.dtype, name="stem1"
        )
        enc0 = run(stem2, run(stem, x, 0), 0)

        # ---- decoder: bottleneck up through the branches to full res ----
        h = to_3d(ztop)
        for k in reversed(range(levels)):
            f = feats[k]
            h = TransposedConvUp(features=f, strides=2, dtype=self.dtype, name=f"dec{k}_up")(h)
            skip = branches[k] if k > 0 else enc0
            h = jnp.concatenate([h, skip], axis=-1)
            h = run(
                ConvBlock(features=f, norm=self.norm, act=self.act, dtype=self.dtype,
                          name=f"dec{k}_conv0"),
                h, k,
            )
            h = run(
                ConvBlock(features=f, norm=self.norm, act=self.act, dtype=self.dtype,
                          name=f"dec{k}_conv1"),
                h, k,
            )

        logits = nn.Conv(
            features=self.num_classes,
            kernel_size=(1, 1, 1),
            padding="SAME",
            dtype=jnp.float32,
            name="head",
        )(h.astype(jnp.float32))
        return logits
