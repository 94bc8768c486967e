"""Train state pytree.

The functional analogue of the reference's (model, optimizer, scheduler)
triple: everything the jitted step reads or writes lives in one pytree that is
donated to the step for in-place buffer reuse on TPU.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any  # {} for stateless (instance-norm) models
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    # Polyak/EMA shadow of ``params`` (training.ema) — None when disabled.
    # Updated inside the jitted train step; evaluation/checkpoint-selection
    # read it via trainer.eval_state() when training.ema.eval is on.
    ema_params: Any = None

    @classmethod
    def create(cls, *, apply_fn, params, tx, batch_stats=None) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
