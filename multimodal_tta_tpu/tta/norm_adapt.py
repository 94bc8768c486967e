"""Statistic-only test-time adaptation ("norm" / BN-adapt).

The gradient-free half of the north-star recipe ("entropy-minimization /
norm-statistic update"): recompute BatchNorm statistics from the test batch —
one train=True forward, no parameter updates. With a mesh-sharded batch the
batch moments pool across chips automatically (XLA inserts the cross-chip
mean), i.e. the "BN-statistic allreduce over ICI".

Only meaningful for models with batch statistics; InstanceNorm models are
stateless and pass through unchanged (with a warning).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..conf.node import ConfigNode
from ..ops.intensity import make_intensity_normalizer
from ..parallel.mesh import batch_sharding, replicated
from ..registry import register_tta_method
from ..utils.config import get_config
from ..utils.logger import get_logger


@register_tta_method("norm")
class NormAdapter:
    def __init__(self, tta_cfg, config=None, mesh=None, device_transform=None):
        self.cfg = tta_cfg or ConfigNode()
        self.config = config or ConfigNode()
        self.mesh = mesh
        self.logger = get_logger()
        self.episodic = bool(get_config(self.cfg, "episodic", True))
        self.last_entropy = None

        self.device_transform = device_transform or {}
        self._norm_fn = None
        if self.device_transform.get("normalize"):
            self._norm_fn = make_intensity_normalizer(
                normalize=True,
                intensity_policy=self.device_transform.get("intensity_policy"),
                channel_names=self.device_transform.get("channel_names"),
                mean=self.device_transform.get("mean"),
                std=self.device_transform.get("std"),
            )
        self._step = None

    def _build_step(self, state):
        norm_fn = self._norm_fn

        def step(params, batch_stats, image):
            image = image.astype(jnp.float32)  # upcast compact transfer dtypes
            if norm_fn is not None:
                image = jax.vmap(norm_fn)(image)
            variables = {"params": params, "batch_stats": batch_stats}
            _, updates = state.apply_fn(variables, image, train=True, mutable=["batch_stats"])
            return updates["batch_stats"]

        if self.mesh is not None:
            bsh = batch_sharding(self.mesh)
            rep = replicated(self.mesh)
            return jax.jit(step, in_shardings=(rep, rep, bsh), out_shardings=rep)
        return jax.jit(step)

    def make_adapt_fn(self, source_state):
        if not source_state.batch_stats:
            self.logger.warning(
                "[norm] model has no batch statistics (InstanceNorm?); "
                "statistic adaptation is a no-op"
            )

            def identity(state, image, n_valid):
                return source_state if self.episodic else state

            return identity

        if self._step is None:
            self._step = self._build_step(source_state)

        def adapt_fn(state, image, n_valid):
            base = source_state if self.episodic else state
            new_bs = self._step(base.params, base.batch_stats, image)
            return base.replace(batch_stats=new_bs)

        return adapt_fn
