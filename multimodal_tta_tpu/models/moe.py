"""Mixture-of-Experts MLP with expert parallelism over a mesh axis.

A beyond-reference capability: the reference has no MoE and no expert
parallelism anywhere (SURVEY.md §2.2 — its only multi-device path is
``torch.nn.DataParallel``). This module completes the framework's
parallelism portfolio (dp / sp / tp / pp / **ep**) with the canonical
TPU formulation (Switch Transformer / GShard): routing is expressed as
dense one-hot dispatch/combine einsums over a static expert-capacity
buffer, so the whole layer is three big MXU matmuls plus elementwise —
no dynamic shapes, no host control flow, jit/scan/SPMD-safe.

Expert parallelism: expert-major tensors ([E, ...] activations) are
pinned to the mesh ``expert`` axis via sharding constraints
(parallel/mesh.constrain — graceful no-op without a matching mesh), so
each device computes only its expert shard's FFNs and XLA inserts the
dispatch/combine collectives over ICI. ``training.mesh.expert`` sizes
the axis (parallel/mesh.py).

Routing semantics (static, compiler-friendly):
  - top-k (k in {1, 2}) over a fp32 softmax router; k=2 gate weights are
    renormalized to sum 1 (GShard), k=1 uses the raw gate (Switch).
  - per-expert capacity C = ceil(capacity_factor * k * N / E); tokens
    beyond an expert's capacity are DROPPED (contribute nothing to the
    combine — the surrounding residual connection carries them through
    unchanged, the standard Switch behavior).
  - load-balance aux loss (Switch eq. 4): E * sum_e f_e * P_e, where
    f_e = fraction of tokens whose FIRST choice is e and P_e = mean
    router probability for e; balanced routing gives ~1.0. Sown under
    ``intermediates/.../moe_aux`` so SegTrainer can add
    ``model.moe_aux_weight`` * mean(aux) to the training loss; the
    dropped-token fraction is sown as ``moe_dropped`` for observability.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from ..parallel.mesh import constrain

EXPERT_AXIS = "expert"


def _expert_init(in_axis: int, out_axis: int):
    """LeCun-normal per expert: fan computed over (in, out), expert dim 0
    treated as a batch axis."""
    return nn.initializers.variance_scaling(
        1.0, "fan_in", "truncated_normal",
        in_axis=in_axis, out_axis=out_axis, batch_axis=(0,),
    )


class MoEMlp(nn.Module):
    """Drop-in replacement for a transformer FFN ([B, N, H] -> [B, N, H])."""

    hidden: int
    mlp_dim: int
    num_experts: int
    k: int = 1
    capacity_factor: float = 1.25
    expert_axis: Optional[str] = EXPERT_AXIS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if self.k not in (1, 2):
            raise ValueError(f"MoEMlp supports top-1/top-2 routing, got k={self.k}")
        if self.num_experts < 2:
            raise ValueError(f"MoEMlp needs >= 2 experts, got {self.num_experts}")
        b, n, h = x.shape
        e = self.num_experts
        cap = int(math.ceil(self.capacity_factor * self.k * n / e))
        cap = max(1, min(cap, n))

        # ---- router (fp32 for a stable softmax regardless of compute dtype)
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(x.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)  # [B, N, E]
        top_g, top_i = jax.lax.top_k(gates, self.k)  # [B, N, k]
        if self.k > 1:
            top_g = top_g / jnp.maximum(jnp.sum(top_g, axis=-1, keepdims=True), 1e-9)

        # ---- capacity assignment: sequential over the k choices so a
        # token's second choice queues behind all first choices (GShard)
        counts = jnp.zeros((b, e), jnp.float32)  # tokens already assigned
        dispatch = jnp.zeros((b, n, e, cap), jnp.float32)
        combine = jnp.zeros((b, n, e, cap), jnp.float32)
        for j in range(self.k):
            oh_e = jax.nn.one_hot(top_i[..., j], e, dtype=jnp.float32)  # [B,N,E]
            # position of each token in its expert's buffer = tokens routed
            # to that expert earlier in the sequence (+ earlier choices)
            pos_e = jnp.cumsum(oh_e, axis=1) - 1.0 + counts[:, None, :]
            pos = jnp.sum(pos_e * oh_e, axis=-1)  # [B, N]
            keep = (pos < cap).astype(jnp.float32)
            oh_c = jax.nn.one_hot(pos.astype(jnp.int32), cap, dtype=jnp.float32)
            d_j = oh_e[..., None] * oh_c[:, :, None, :] * keep[..., None, None]
            dispatch = dispatch + d_j
            combine = combine + d_j * top_g[..., j][..., None, None]
            counts = counts + jnp.sum(oh_e, axis=1)

        # ---- load-balance aux loss + dropped-fraction observability
        f_e = jnp.mean(jax.nn.one_hot(top_i[..., 0], e, dtype=jnp.float32), axis=(0, 1))
        p_e = jnp.mean(gates, axis=(0, 1))
        aux = e * jnp.sum(f_e * p_e)
        dropped = 1.0 - jnp.sum(dispatch) / float(b * n * self.k)
        self.sow("intermediates", "moe_aux", aux)
        self.sow("intermediates", "moe_dropped", dropped)

        # ---- expert FFN over the capacity buffer (three MXU einsums)
        wi = self.param("wi", _expert_init(-2, -1), (e, h, self.mlp_dim))
        bi = self.param("bi", nn.initializers.zeros, (e, self.mlp_dim))
        wo = self.param("wo", _expert_init(-2, -1), (e, self.mlp_dim, h))
        bo = self.param("bo", nn.initializers.zeros, (e, h))

        ax = self.expert_axis
        espec4 = P(ax, None, None, None)
        xin = jnp.einsum("bnec,bnh->ebch", dispatch.astype(self.dtype), x)
        xin = constrain(xin, espec4)
        y = jnp.einsum("ebch,ehf->ebcf", xin, wi.astype(self.dtype))
        y = y + bi.astype(self.dtype)[:, None, None, :]
        y = constrain(y, espec4)
        y = nn.gelu(y, approximate=False)
        y = jnp.einsum("ebcf,efh->ebch", y, wo.astype(self.dtype))
        y = y + bo.astype(self.dtype)[:, None, None, :]
        y = constrain(y, espec4)
        return jnp.einsum("bnec,ebch->bnh", combine.astype(self.dtype), y)


def collect_moe_aux(intermediates) -> list:
    """All sown ``moe_aux`` scalars anywhere in an intermediates tree."""
    out = []

    def walk(node):
        if isinstance(node, dict):
            for key, val in node.items():
                if key == "moe_aux":
                    out.extend(val if isinstance(val, (tuple, list)) else [val])
                else:
                    walk(val)

    walk(intermediates)
    return out
