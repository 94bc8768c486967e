"""Multimodal UNet with per-modality encoders and residual bottleneck fusion.

Capability parity with the reference's live multimodal model (reference:
src/models/unet_multimodal_midfusion.py:139-270), registered under the same
two names ("unet_multimodal_deepfusion" / "unet_multimodal_midfusion"):

  - one SpecificEncoder per modality (5 ResidualUnit stages, strides
    [2,2,2,2,1]), returning bottleneck + global-pooled feature + skips
  - pseudo-shared bottleneck = mean of per-modality bottlenecks; each modality
    fused against it by residual CompositionalLayer
    (fused = shared + Conv(cat(shared, specific)))
  - concat fused feats -> 1x1x1 reduce (M*512 -> 512)
  - decoder skips = mean over modalities; final skip = raw-input mean
  - optional domain classifier Dense(512 -> M) over specific global feats,
    exposed via ``return_domain_logits``

TPU-first notes: the M per-modality encoders share one weight-structure and
run as a single batched conv stack by folding modalities into the batch axis
would share weights — the reference gives each modality INDEPENDENT params, so
here each encoder is its own submodule; XLA still fuses the elementwise mean/
fusion chain. NDHWC layout throughout.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..registry import register_model
from ..utils.config import get_config
from .layers import ConvBlock, ResidualUnit, UpSample


class SpecificEncoder(nn.Module):
    channels: Sequence[int]
    strides: Sequence[int]
    num_res_units: int
    act: str
    norm: str
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, List[jnp.ndarray]]:
        """x: [B,D,H,W,1] -> (bottleneck, global_feat [B,C], skips)."""
        skips: List[jnp.ndarray] = []
        strides = list(self.strides) + [1]
        h = x
        for i, (feat, s) in enumerate(zip(self.channels, strides)):
            h = ResidualUnit(
                features=feat,
                strides=s,
                subunits=self.num_res_units,
                norm=self.norm,
                act=self.act,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer{i}",
            )(h, train=train)
            if i < len(self.channels) - 1:
                skips.append(h)
        global_feat = jnp.mean(h, axis=(1, 2, 3))  # [B, C_last]
        return h, global_feat, skips


class CompositionalLayer(nn.Module):
    """Residual fusion at the bottleneck: shared + Conv(cat(shared, specific))."""

    features: int
    norm: str
    act: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, f_shared: jnp.ndarray, f_specific: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        concat = jnp.concatenate([f_shared, f_specific], axis=-1)
        residual = ConvBlock(
            features=self.features,
            kernel_size=3,
            strides=1,
            norm=self.norm,
            act=self.act,
            dtype=self.dtype,
            name="fusion_conv",
        )(concat, train=train)
        return f_shared + residual


class DecoderStage(nn.Module):
    """Upsample + concat skip + ResidualUnit (reference: DecoderStage, 99-136)."""

    features: int
    stride: int
    num_res_units: int
    act: str
    norm: str
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = UpSample(features=self.features, scale=self.stride, dtype=self.dtype, name="upsample")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return ResidualUnit(
            features=self.features,
            strides=1,
            subunits=self.num_res_units,
            norm=self.norm,
            act=self.act,
            dropout=self.dropout,
            dtype=self.dtype,
            name="conv",
        )(x, train=train)


@register_model("unet_multimodal_deepfusion")
@register_model("unet_multimodal_midfusion")
class MultimodalUNetMidFusion(nn.Module):
    num_modalities: int = 4
    num_classes: int = 3
    channels: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (2, 2, 2, 2)
    num_res_units: int = 2
    act: str = "RELU"
    norm: str = "INSTANCE"
    dropout: float = 0.0
    domain_enabled: bool = True
    domain_loss_weight: float = 0.1
    dtype: Any = jnp.float32
    remat: bool = False

    @classmethod
    def from_config(cls, cfg, **overrides) -> "MultimodalUNetMidFusion":
        domain_cfg = get_config(cfg, "domain_classifier", {})
        kw = dict(
            num_modalities=int(get_config(cfg, "num_modalities", 4)),
            num_classes=int(get_config(cfg, "num_classes", 3)),
            channels=tuple(int(c) for c in get_config(cfg, "channels", [32, 64, 128, 256, 512])),
            strides=tuple(int(s) for s in get_config(cfg, "strides", [2, 2, 2, 2])),
            num_res_units=int(get_config(cfg, "num_res_units", 2)),
            act=str(get_config(cfg, "act", "RELU")),
            norm=str(get_config(cfg, "norm", "INSTANCE")),
            dropout=float(get_config(cfg, "dropout", 0.0)),
            domain_enabled=bool(get_config(domain_cfg, "enabled", True)),
            domain_loss_weight=float(get_config(domain_cfg, "loss_weight", 0.1)),
        )
        kw.update(overrides)
        return cls(**kw)

    def get_domain_loss_weight(self) -> float:
        return self.domain_loss_weight if self.domain_enabled else 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        return_domain_logits: bool = False,
        return_intermediate_features: bool = False,
    ):
        """x: [B, D, H, W, M] -> logits [B, D, H, W, num_classes]
        (+ optional domain logits [B*M, M] / intermediate features)."""
        B = x.shape[0]
        M = self.num_modalities
        if x.shape[-1] != M:
            raise ValueError(f"Expected {M} modalities, got {x.shape[-1]} channels")
        x = x.astype(self.dtype)
        chs = list(self.channels)

        def run_encoder(enc, xin):
            if self.remat:
                return nn.remat(lambda mdl, a: mdl(a, train=train))(enc, xin)
            return enc(xin, train=train)

        def run_stage(stage, *args):
            # remat must cover the fusion + decoder too: with 4 full-res
            # encoders AND a full-res decoder, [160,192,160] doesn't fit one
            # chip's HBM otherwise (SURVEY.md §7.3 hard-part 4)
            if self.remat:
                return nn.remat(lambda mdl, *a: mdl(*a, train=train))(stage, *args)
            return stage(*args, train=train)

        specific_feats, specific_globals, all_skips = [], [], []
        for m in range(M):
            enc = SpecificEncoder(
                channels=chs,
                strides=self.strides,
                num_res_units=self.num_res_units,
                act=self.act,
                norm=self.norm,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"specific_encoder{m}",
            )
            feat, glob, skips = run_encoder(enc, x[..., m : m + 1])
            specific_feats.append(feat)
            specific_globals.append(glob)
            all_skips.append(skips)

        # ---- pseudo-shared residual fusion at bottleneck ----
        pseudo_shared = jnp.mean(jnp.stack(specific_feats, axis=0), axis=0)
        fusion = CompositionalLayer(
            features=chs[-1], norm=self.norm, act=self.act, dtype=self.dtype, name="fusion_layer"
        )
        fused = [run_stage(fusion, pseudo_shared, f) for f in specific_feats]
        h = nn.Conv(
            features=chs[-1],
            kernel_size=(1, 1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="bottleneck_reduce",
        )(jnp.concatenate(fused, axis=-1))

        # ---- fused skips: mean over modalities; last skip = raw-input mean ----
        n_skips = len(all_skips[0])
        fused_skips = [
            jnp.mean(jnp.stack([sk[i] for sk in all_skips], axis=0), axis=0) for i in range(n_skips)
        ]
        input_mean = jnp.mean(x, axis=-1, keepdims=True)

        # decoder: [skips[2]@R/8, skips[1]@R/4, skips[0]@R/2, input@R]
        skips_for_dec = [fused_skips[2], fused_skips[1], fused_skips[0], input_mean]
        dec_feats = [chs[3], chs[2], chs[1], chs[0]]
        dec_strides = [self.strides[3], self.strides[2], self.strides[1], self.strides[0]]
        for i in range(len(dec_feats)):
            stage = DecoderStage(
                features=dec_feats[i],
                stride=dec_strides[i],
                num_res_units=self.num_res_units,
                act=self.act,
                norm=self.norm,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"decoder{i}",
            )
            h = run_stage(stage, h, skips_for_dec[i])

        logits = nn.Conv(
            features=self.num_classes,
            kernel_size=(1, 1, 1),
            dtype=jnp.float32,
            name="final_conv",
        )(h.astype(jnp.float32))

        # Create the domain head whenever enabled so its params exist at init
        # regardless of the call-time flags.
        domain_logits = None
        if self.domain_enabled:
            stacked = jnp.concatenate(specific_globals, axis=0).astype(jnp.float32)  # [B*M, C]
            domain_logits = nn.Dense(M, name="domain_classifier")(stacked)

        if return_intermediate_features and self.domain_enabled:
            shared_globals_rep = [jnp.mean(pseudo_shared, axis=(1, 2, 3)) for _ in range(M)]
            return logits, shared_globals_rep, specific_globals

        if return_domain_logits and self.domain_enabled:
            return logits, domain_logits

        return logits
