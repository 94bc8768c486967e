"""Optimizer + LR-schedule factories over optax.

Mirrors the reference's optimizer surface (reference:
src/core/experiment_manager.py:199-316): sgd/adam/adamw selected by
``training.optimizer``, per-optimizer kwarg blocks under
``training.optimizers.<name>``, weight decay excluded for bias/norm/1-D params
per ``training.param_groups`` rules, and epoch-stepped schedulers
(none/step/multistep/cosine/reduce_on_plateau).

Design: the returned optax chain is wrapped in ``optax.inject_hyperparams`` so
the trainer can set the learning rate per epoch (the reference steps its
scheduler once per epoch — trainer_base.py:295-296) without rebuilding the
optimizer; reduce_on_plateau state (best loss, patience counter) lives in the
scheduler object on host.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import optax

from ..conf.node import ConfigNode
from ..utils.config import get_config


def no_decay_mask(params, no_decay_keys, treat_1d: bool = True):
    """Pytree mask: True where weight decay APPLIES.

    A param is excluded from decay when any configured key is a substring of
    its path, or when it is 1-D (bias/scale) and treat_1d is set — the same
    rules as the reference (experiment_manager.py:214-230).
    """
    keys = [str(k).lower() for k in (no_decay_keys or [])]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path, leaf) -> bool:
        path_str = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if any(k in path_str for k in keys):
            return False
        if treat_1d and hasattr(leaf, "ndim") and leaf.ndim <= 1:
            return False
        return True

    mask_flat = {jax.tree_util.keystr(p): decide(p, l) for p, l in flat}

    def to_mask(path, leaf):
        return mask_flat[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(to_mask, params)


def build_optimizer(training_cfg, params) -> Tuple[optax.GradientTransformation, float]:
    """Build the optax chain; returns (tx, base_lr). The chain is wrapped in
    inject_hyperparams so opt_state.hyperparams['learning_rate'] is mutable."""
    opt_name = str(get_config(training_cfg, "optimizer", "sgd")).lower()
    if opt_name not in ("sgd", "adam", "adamw", "adafactor"):
        # validate eagerly: inject_hyperparams defers the inner factory to
        # init time, which would push a config typo's error past bring-up
        raise ValueError(f"Unsupported optimizer: {opt_name}")
    blocks = get_config(training_cfg, "optimizers", ConfigNode())
    opt_cfg = get_config(blocks, opt_name, ConfigNode())

    lr = float(
        get_config(opt_cfg, "lr", get_config(training_cfg, "learning_rate", 1e-3))
    )
    wd = float(
        get_config(opt_cfg, "weight_decay", get_config(training_cfg, "weight_decay", 0.0))
    )

    pg = get_config(training_cfg, "param_groups", ConfigNode())
    nd_keys = get_config(pg, "no_decay_keys", [])
    treat_1d = bool(get_config(pg, "treat_1d_as_no_decay", True))
    mask = no_decay_mask(params, nd_keys, treat_1d) if wd > 0 else None

    def make(learning_rate):
        parts = []
        if opt_name == "sgd":
            momentum = float(get_config(opt_cfg, "momentum", get_config(training_cfg, "momentum", 0.0)))
            nesterov = bool(get_config(opt_cfg, "nesterov", False))
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd, mask=mask))
            parts.append(optax.sgd(learning_rate, momentum=momentum or None, nesterov=nesterov))
        elif opt_name == "adam":
            betas = get_config(opt_cfg, "betas", [0.9, 0.999])
            eps = float(get_config(opt_cfg, "eps", 1e-8))
            # torch.optim.Adam applies weight_decay as L2 added to the gradient
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd, mask=mask))
            parts.append(optax.adam(learning_rate, b1=float(betas[0]), b2=float(betas[1]), eps=eps))
        elif opt_name == "adafactor":
            # Memory-lean option beyond the reference's torch surface: the
            # factored second moment stores row/col statistics instead of a
            # full params-sized tensor (Shazeer & Stern 2018), cutting
            # optimizer HBM from ~2x params (Adam mu+nu) to ~1x+eps. This is
            # what makes the measured single-chip moe8 OOM case trainable
            # (BASELINE.md: Adam moments put experts=8 246M over v5e HBM).
            # momentum=None (the Adafactor default) is the memory-lean mode;
            # set training.optimizers.adafactor.momentum for quality parity
            # experiments (costs a params-sized slot, still saves nu).
            momentum = get_config(opt_cfg, "momentum", None)
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd, mask=mask))
            parts.append(
                optax.adafactor(
                    learning_rate,
                    min_dim_size_to_factor=int(get_config(opt_cfg, "min_dim_size_to_factor", 128)),
                    decay_rate=float(get_config(opt_cfg, "decay_rate", 0.8)),
                    momentum=None if momentum in (None, 0, 0.0, False, "none") else float(momentum),
                    clipping_threshold=float(get_config(opt_cfg, "clipping_threshold", 1.0)),
                    # the factory injects the LR explicitly, so disable
                    # Adafactor's relative-scale heuristic by default to keep
                    # the epoch scheduler semantics identical across optimizers
                    multiply_by_parameter_scale=bool(
                        get_config(opt_cfg, "multiply_by_parameter_scale", False)
                    ),
                )
            )
        elif opt_name == "adamw":
            betas = get_config(opt_cfg, "betas", [0.9, 0.999])
            eps = float(get_config(opt_cfg, "eps", 1e-8))
            parts.append(
                optax.adamw(
                    learning_rate,
                    b1=float(betas[0]),
                    b2=float(betas[1]),
                    eps=eps,
                    weight_decay=wd,
                    mask=mask,
                )
            )
        else:
            raise ValueError(f"Unsupported optimizer: {opt_name}")
        return optax.chain(*parts)

    tx = optax.inject_hyperparams(lambda learning_rate: make(learning_rate))(learning_rate=lr)

    # Gradient accumulation (training.grad_accum=k): each run_step processes a
    # microbatch; MultiSteps keeps a running average of the grads in opt_state
    # and applies one optimizer update every k-th step, so the effective batch
    # is k * training.batch_size at the activation memory of ONE microbatch.
    # This is the single-chip answer to whole-volume HBM walls (BASELINE.md
    # hard-part 4): batch-1 activations, batch-k gradient statistics. The
    # accumulator is a params-sized opt_state leaf, so training.zero1 shards
    # it over the data axis like any other moment.
    accum = int(get_config(training_cfg, "grad_accum", 1))
    if accum < 1:
        raise ValueError(f"training.grad_accum must be >= 1, got {accum}")
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, lr


def _hyperparams_state(opt_state):
    """The inject_hyperparams state, unwrapping optax.MultiSteps if present."""
    while not hasattr(opt_state, "hyperparams"):
        if hasattr(opt_state, "inner_opt_state"):
            opt_state = opt_state.inner_opt_state
        else:
            raise AttributeError(
                f"no inject_hyperparams state found in {type(opt_state).__name__}"
            )
    return opt_state


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in an inject_hyperparams state
    (possibly nested inside an optax.MultiSteps wrapper)."""
    hp = _hyperparams_state(opt_state)
    hp.hyperparams["learning_rate"] = jax.numpy.asarray(
        lr, dtype=hp.hyperparams["learning_rate"].dtype
    )
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(_hyperparams_state(opt_state).hyperparams["learning_rate"])


class EpochScheduler:
    """Epoch-indexed LR schedule with the reference's scheduler vocabulary
    (reference: src/core/experiment_manager.py:275-316)."""

    def __init__(self, training_cfg, base_lr: float):
        sched_cfg = get_config(training_cfg, "scheduler", ConfigNode())
        self.name = str(get_config(sched_cfg, "name", "none")).lower()
        args = get_config(sched_cfg, "args", ConfigNode())
        self.base_lr = float(base_lr)
        self.epochs = int(get_config(training_cfg, "epochs", 200))

        self.milestones = [int(m) for m in get_config(args, "milestones", get_config(training_cfg, "milestones", [100, 150]))]
        self.gamma = float(get_config(args, "gamma", get_config(training_cfg, "gamma", 0.1)))
        self.step_size = int(get_config(args, "step_size", get_config(training_cfg, "step_size", 30)))
        # "poly": the nnU-Net standard for these workloads —
        # lr * (1 - epoch/epochs)^power, power 0.9
        self.power = float(get_config(args, "power", get_config(training_cfg, "power", 0.9)))
        # linear warmup over the first N epochs: lr * (e+1)/N, composing
        # with ANY schedule name (including "none") — the schedule's own
        # index keeps running during warmup, warmup just caps the ramp
        self.warmup_epochs = int(get_config(args, "warmup_epochs",
                                            get_config(training_cfg, "warmup_epochs", 0)))

        rop = get_config(args, "reduce_on_plateau", get_config(training_cfg, "reduce_on_plateau", ConfigNode()))
        self.rop_factor = float(get_config(rop, "factor", 0.1))
        self.rop_patience = int(get_config(rop, "patience", 10))
        self.rop_min_lr = float(get_config(rop, "min_lr", 1e-7))
        self._rop_best = float("inf")
        self._rop_bad = 0
        self._rop_lr = self.base_lr

    @property
    def enabled(self) -> bool:
        return self.name not in ("none", "") or self.warmup_epochs > 0

    def lr_for_epoch(self, epoch: int, val_loss: Optional[float] = None) -> float:
        """LR to use for epoch ``epoch`` (0-based), stepped per epoch."""
        if self.warmup_epochs > 0 and epoch < self.warmup_epochs:
            return self.base_lr * (epoch + 1) / self.warmup_epochs
        if self.name in ("none", ""):
            return self.base_lr
        if self.name == "poly":
            t = min(epoch, self.epochs) / max(1, self.epochs)
            return self.base_lr * (1.0 - t) ** self.power
        if self.name == "multistep":
            k = sum(1 for m in self.milestones if epoch >= m)
            return self.base_lr * (self.gamma ** k)
        if self.name == "step":
            return self.base_lr * (self.gamma ** (epoch // self.step_size))
        if self.name == "cosine":
            import math

            t = min(epoch, self.epochs) / max(1, self.epochs)
            return 0.5 * self.base_lr * (1 + math.cos(math.pi * t))
        if self.name == "reduce_on_plateau":
            if val_loss is not None:
                if val_loss < self._rop_best:
                    self._rop_best = val_loss
                    self._rop_bad = 0
                else:
                    self._rop_bad += 1
                    if self._rop_bad > self.rop_patience:
                        self._rop_lr = max(self._rop_lr * self.rop_factor, self.rop_min_lr)
                        self._rop_bad = 0
            return self._rop_lr
        # unknown names -> no scheduling (same leniency as the reference)
        return self.base_lr

    def state_dict(self) -> Dict[str, Any]:
        return {
            "rop_best": self._rop_best,
            "rop_bad": self._rop_bad,
            "rop_lr": self._rop_lr,
        }

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self._rop_best = float(sd.get("rop_best", float("inf")))
        self._rop_bad = int(sd.get("rop_bad", 0))
        self._rop_lr = float(sd.get("rop_lr", self.base_lr))
