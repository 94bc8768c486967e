"""Mixture-of-Gaussians VAE delta generator ("vae_delta_mog").

Inventory parity with the reference's UE perturbation generator (reference:
src/models/mogvae.py:13-123 — dead code there, kept registered for API
completeness): a conv variational autoencoder whose latent uses a K-component
mixture-of-Gaussians soft reparameterization

    z = sum_k pi~_k * (mu_k + sigma_k * eps_k),   pi~ = softmax(log_pi [+ gate(x)])

and whose decoder emits an unconstrained delta map (the caller applies the
L-inf / pixel-box projection). 2D NHWC, flax.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import register_model
from ..utils.config import get_config


@register_model("vae_delta_mog")
class VAEDeltaMoG(nn.Module):
    in_channels: int = 3
    out_channels: int = 1
    latent_size: int = 128
    channels: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (2, 2, 2, 2)
    image_size: Tuple[int, int] = (64, 64)
    mog_k: int = 16
    use_gate: bool = False
    gate_hidden: int = 256
    act: str = "relu"
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, **overrides) -> "VAEDeltaMoG":
        kw = dict(
            in_channels=int(get_config(cfg, "in_channels", 3)),
            out_channels=int(get_config(cfg, "out_channels", 1)),
            latent_size=int(get_config(cfg, "latent_size", 128)),
            channels=tuple(int(c) for c in get_config(cfg, "channels", [32, 64, 128, 256, 512])),
            strides=tuple(int(s) for s in get_config(cfg, "strides", [2, 2, 2, 2])),
            image_size=tuple(int(s) for s in get_config(cfg, "image_size", [64, 64])),
            mog_k=int(get_config(cfg, "mog.K", 16)),
            use_gate=bool(get_config(cfg, "mog.use_gate", False)),
            gate_hidden=int(get_config(cfg, "mog.gate_hidden", 256)),
        )
        kw.update(overrides)
        kw.pop("remat", None)
        return cls(**kw)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False, rng: jnp.ndarray = None):
        """x: [B,H,W,C] -> (delta_raw [B,H,W,out_channels], aux dict with
        z / mixture stats for the KL term)."""
        b = x.shape[0]
        x = x.astype(self.dtype)

        # ---- encoder ----
        h = x
        for i, (feat, s) in enumerate(zip(self.channels[: len(self.strides)], self.strides)):
            h = nn.Conv(feat, (3, 3), (s, s), padding="SAME", dtype=self.dtype, name=f"enc{i}")(h)
            h = nn.relu(h)
        bottleneck = h  # [B, h, w, C_last]
        flat = bottleneck.reshape(b, -1)

        mu = nn.Dense(self.latent_size, name="mu")(flat.astype(jnp.float32))
        logvar = nn.Dense(self.latent_size, name="logvar")(flat.astype(jnp.float32))

        # ---- MoG prior parameters ----
        k = self.mog_k
        mu_k = self.param("mu_k", nn.initializers.zeros, (k, self.latent_size))
        logsig_k = self.param("logsig_k", nn.initializers.zeros, (k, self.latent_size))
        logpi = self.param("logpi", nn.initializers.zeros, (k,))

        mix_logits = jnp.broadcast_to(logpi, (b, k))
        if self.use_gate:
            pooled = jnp.mean(bottleneck, axis=(1, 2)).astype(jnp.float32)
            g = nn.Dense(self.gate_hidden, name="gate_h")(pooled)
            g = nn.relu(g)
            mix_logits = mix_logits + nn.Dense(k, name="gate_out")(g)
        pi = jax.nn.softmax(mix_logits, axis=-1)  # [B, K]

        # ---- soft mixture reparameterization ----
        if rng is None:
            rng = self.make_rng("reparam") if self.has_rng("reparam") else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        eps_post = jax.random.normal(k1, mu.shape)
        z_post = mu + jnp.exp(0.5 * logvar) * eps_post  # standard VAE sample

        eps_k = jax.random.normal(k2, (b, k, self.latent_size))
        comp = mu_k[None] + jax.nn.softplus(logsig_k)[None] * eps_k  # [B,K,L]
        z_prior = jnp.sum(pi[:, :, None] * comp, axis=1)  # soft mixture sample

        z = z_post + z_prior

        # ---- decoder ----
        down = 1
        for s in self.strides:
            down *= s
        h0, w0 = self.image_size[0] // down, self.image_size[1] // down
        feat0 = self.channels[len(self.strides) - 1]
        h = nn.Dense(h0 * w0 * feat0, name="unflatten")(z).reshape(b, h0, w0, feat0)
        h = h.astype(self.dtype)
        for i, s in enumerate(reversed(self.strides)):
            feat = self.channels[max(0, len(self.strides) - 2 - i)]
            h = nn.ConvTranspose(feat, (s, s), (s, s), padding="VALID", dtype=self.dtype, name=f"dec{i}")(h)
            h = nn.relu(h)
        delta = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=jnp.float32, name="head")(
            h.astype(jnp.float32)
        )
        aux = {"mu": mu, "logvar": logvar, "pi": pi, "z": z}
        return delta, aux
