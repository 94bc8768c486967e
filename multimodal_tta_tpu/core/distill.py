"""Knowledge distillation: a frozen teacher guides the supervised step.

Motivation (BASELINE.md unet_ws table): the weight-standardized half-res-head
variant serves 2.14x faster than the flagship but gives up ~0.02 val Dice.
Distilling the flagship's soft predictions into the student during training
is the standard way to buy that quality back without touching serving cost
(Hinton et al., "Distilling the Knowledge in a Neural Network", 2015 —
public method).

TPU-first shape: the teacher forward runs INSIDE the student's jitted SPMD
train step (same batch sharding; no extra dispatch), under
``stop_gradient`` so XLA never builds its backward. Teacher variables ride
as a replicated jit argument — not captured constants, which would bake
~31M params into the executable.

The reference has no distillation (or any student/teacher machinery) —
new capability; closest analogue is its vestigial UE "surrogate model"
config surface (reference src/core/experiment_manager.py:98-109).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from ..conf.node import ConfigNode
from ..utils.config import get_config, require_config


def kd_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    *,
    sigmoid: bool = True,
    temperature: float = 2.0,
    focus: str = "all",
) -> jnp.ndarray:
    """Per-sample [B] Hinton KD loss: T^2 * KL(teacher_T || student_T).

    sigmoid mode: per-voxel per-channel Bernoulli KL of the
    temperature-softened probabilities; softmax mode: categorical KL over
    the channel axis. Scaled by T^2 so the gradient magnitude is
    temperature-invariant (the classic correction). Teacher side is
    stop-gradient by construction (callers pass frozen teacher logits;
    KL is computed against them as constants).

    focus:
      "all"       — plain mean over voxels (and channels).
      "uncertain" — weight each voxel's KL by the TEACHER's own (softened,
        stop-grad) prediction entropy, self-normalized per sample. Dense 3D
        segmentation dilutes the plain mean with millions of confident
        background voxels where teacher and student trivially agree — the
        same vanishing-signal pathology measured for plain Tent
        (ops/losses.py entropy_loss); the teacher's dark knowledge lives at
        its uncertain boundary voxels, so that is where the distillation
        pressure goes.
    """
    t = float(temperature)
    ls = student_logits / t
    lt = jax.lax.stop_gradient(teacher_logits) / t
    if sigmoid:
        pt = jax.nn.sigmoid(lt)
        # KL(pt || ps) per voxel-channel, in logit form for stability
        kl = pt * (jax.nn.log_sigmoid(lt) - jax.nn.log_sigmoid(ls)) + (1.0 - pt) * (
            jax.nn.log_sigmoid(-lt) - jax.nn.log_sigmoid(-ls)
        )
        h_t = -(
            pt * jax.nn.log_sigmoid(lt) + (1.0 - pt) * jax.nn.log_sigmoid(-lt)
        )
    else:
        logpt = jax.nn.log_softmax(lt, axis=-1)
        logps = jax.nn.log_softmax(ls, axis=-1)
        kl = jnp.sum(jnp.exp(logpt) * (logpt - logps), axis=-1)
        h_t = -jnp.sum(jnp.exp(logpt) * logpt, axis=-1)
    reduce_axes = tuple(range(1, kl.ndim))
    if focus == "uncertain":
        w = jax.lax.stop_gradient(h_t)
        num = jnp.sum(kl * w, axis=reduce_axes)
        den = jnp.maximum(jnp.sum(w, axis=reduce_axes), 1e-12)
        return (t * t) * num / den
    if focus != "all":
        raise ValueError(f"[distill] unknown focus: {focus}")
    return (t * t) * jnp.mean(kl, axis=reduce_axes)


class DistillConfig:
    """Parsed ``training.distill`` block."""

    def __init__(self, config):
        node = get_config(config, "training.distill", ConfigNode())
        self.enabled = bool(get_config(node, "enabled", False))
        if not self.enabled:
            return
        self.checkpoint = str(require_config(node, "checkpoint", type_=str))
        self.temperature = float(get_config(node, "temperature", 2.0))
        self.weight = float(get_config(node, "weight", 1.0))
        if self.temperature <= 0:
            raise ValueError("[distill] training.distill.temperature must be > 0")
        if self.weight <= 0:
            raise ValueError(
                "[distill] training.distill.weight must be > 0 — set "
                "training.distill.enabled=false to train without a teacher"
            )
        # serve the teacher's EMA shadow instead of its raw params (the
        # checkpoint must carry one; same contract as training.use_ema_params)
        self.use_ema = bool(get_config(node, "use_ema_params", False))
        # "all" = plain voxel-mean KL; "uncertain" = teacher-entropy-weighted
        # (see kd_loss — the dense-segmentation dilution fix)
        self.focus = str(get_config(node, "focus", "all")).lower()
        if self.focus not in ("all", "uncertain"):
            raise ValueError(f"[distill] unknown focus: {self.focus}")
        # the teacher's model config: a full model node (name + arch keys).
        # Required — defaulting to the student's own arch would silently
        # self-distill when the user meant a different teacher.
        self.model = require_config(node, "model")
        require_config(self.model, "name", type_=str)


def build_teacher(
    config, mesh, input_shape: Tuple[int, int, int, int]
) -> Tuple[Callable, Any]:
    """Construct the frozen teacher: (apply_fn, variables on device).

    The teacher module is built from ``training.distill.model`` via the same
    registry path as the student (experiment_manager.setup_model), its
    variables initialized at ``input_shape`` = (D, H, W, C) and then
    OVERWRITTEN from ``training.distill.checkpoint``. A checkpoint/arch
    mismatch fails in flax's structural restore rather than silently
    training against random teacher predictions.
    """
    from ..parallel.mesh import replicated
    from ..registry import get_model
    from .checkpoint import load_params_only

    dc = DistillConfig(config)
    compute_dtype = str(get_config(config, "training.compute_dtype", "bfloat16"))
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
        compute_dtype
    ]
    model_cls = get_model(str(require_config(dc.model, "name", type_=str)))
    module = model_cls.from_config(dc.model, dtype=dtype)

    d, h, w, c = input_shape
    dummy = jnp.zeros((1, d, h, w, c), jnp.float32)
    variables = jax.jit(
        lambda k, x: module.init(k, x, train=True),
        out_shardings=replicated(mesh) if mesh is not None else None,
    )(jax.random.PRNGKey(0), dummy)

    params, batch_stats = load_params_only(
        dc.checkpoint,
        variables["params"],
        variables.get("batch_stats", {}),
        use_ema=dc.use_ema,
    )
    teacher_vars = {"params": params}
    if batch_stats:
        teacher_vars["batch_stats"] = batch_stats
    if mesh is not None:
        teacher_vars = jax.device_put(teacher_vars, replicated(mesh))
    return module.apply, teacher_vars
