"""Supervised segmentation trainer with one jitted SPMD train step.

Functional rewrite of the reference trainer (reference:
src/core/trainers/seg_trainer.py:13-145): the DiceCE loss is built entirely
from ``training.criterion`` (softmax XOR sigmoid with the same validation)
and labels are shape-checked per mode.

Metrics contract: the device->host loss sync is pipelined one step behind, so
``run_step`` returns the *previous* step's ``{"loss": float}`` (an empty dict
on the first step), and ``flush_step_metrics()`` drains the final pending
loss; callers that need this step's loss immediately call
``run_step(batch)`` then merge ``flush_step_metrics()``.

TPU-native step design:
  - ONE jit compiles the whole step: on-device intensity normalization +
    intensity aug (when transforms defer to device), forward, DiceCE, backward,
    optimizer update
  - the TrainState is donated, so parameter/optimizer buffers are reused
    in-place in HBM
  - batch enters sharded over the mesh ``data`` axis, params replicated; XLA
    inserts the gradient all-reduce over ICI (replacing DataParallel's
    scatter/gather — reference experiment_manager.py:95-96)
  - model compute in ``training.compute_dtype`` (default bfloat16 -> MXU),
    params and loss in fp32
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...conf.node import ConfigNode
from ...ops.augment import modality_dropout, rand_intensity_scale_shift
from ...ops.intensity import make_intensity_normalizer
from ...ops.losses import make_criterion
from ...parallel.mesh import (
    batch_sharding,
    data_axis_size,
    pad_batch_to_multiple,
    replicated,
    shard_batch,
)
from ...utils.config import get_config
from ..trainer_base import TrainerBase


class SegTrainer(TrainerBase):
    def __init__(self, config, mesh=None, evaluation_strategy=None, device_transform=None):
        super().__init__(config, mesh)
        self.evaluation_strategy = evaluation_strategy

        crit_cfg = get_config(config, "training.criterion", ConfigNode())
        self.softmax = bool(get_config(crit_cfg, "softmax", False))
        self.sigmoid = bool(get_config(crit_cfg, "sigmoid", not self.softmax))
        if self.softmax and self.sigmoid:
            raise ValueError("[SegTrainer] softmax=True and sigmoid=True cannot both be True.")
        if not self.softmax and not self.sigmoid:
            raise ValueError("[SegTrainer] both softmax and sigmoid are False. Set one True.")
        self.loss_fn = make_criterion(crit_cfg)

        # nnU-Net-style deep supervision: the model (models/unet3d.py
        # deep_supervision) sows aux logits at the k next-coarser decoder
        # levels; the same DiceCE is applied against strided-slice
        # (nearest) downsampled labels with 1/2^k weights normalized to
        # sum 1 (the nnU-Net recipe — PAPERS.md nnU-Net family).
        self.ds_levels = int(get_config(config, "model.deep_supervision", 0))
        self._model_strides = tuple(
            int(s) for s in get_config(config, "model.strides", [2, 2, 2, 2])
        )

        # MoE load-balance aux loss (models/moe.py): routed-expert models sow
        # per-layer Switch aux scalars; the Switch recipe adds
        # weight * mean(aux) to the task loss so the router learns to spread
        # tokens (weight 0.01 is the Switch Transformer default).
        self.moe_experts = int(get_config(config, "model.moe_experts", 0))
        self.moe_aux_weight = float(get_config(config, "model.moe_aux_weight", 0.01))

        # device-side transform spec (from SegTransform.device_spec())
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

        # compact H2D dtype for images (upcast to f32 on device); halves or
        # quarters the transfer bytes on tunnel/PCIe-bound hosts
        td = str(get_config(config, "training.transfer_dtype", "float32")).lower()
        self._transfer_dtype = {"float32": None, "float16": np.float16, "bfloat16": jnp.bfloat16}[td]

        # Train-time weight EMA (Polyak averaging): a shadow copy of params
        # updated inside the jitted step; training.ema.eval evaluates (and
        # therefore best-model-selects) on the shadow. The shadow costs one
        # elementwise tree_map per step (~params-sized HBM read+write,
        # sub-ms against the conv step) and doubles param memory only.
        # gradient accumulation (training.grad_accum, core/optim.py): params
        # only move every k-th microstep, so the EMA shadow must tick on the
        # apply boundary, not per microstep (k no-op EMA updates would pull
        # the shadow toward frozen params and change the effective decay).
        self.grad_accum = int(get_config(config, "training.grad_accum", 1))

        ema_cfg = get_config(config, "training.ema", ConfigNode())
        self.ema_enabled = bool(get_config(ema_cfg, "enabled", False))
        self.ema_decay = float(get_config(ema_cfg, "decay", 0.999))
        self.ema_eval = bool(get_config(ema_cfg, "eval", True))
        if self.ema_enabled and not (0.0 < self.ema_decay < 1.0):
            raise ValueError(f"[SegTrainer] training.ema.decay must be in (0,1), got {self.ema_decay}")

        # Knowledge distillation (core/distill.py): a frozen teacher's soft
        # predictions join the task loss inside the same jitted step. Parsed
        # eagerly so a bad config fails at bring-up, teacher built lazily
        # (checkpoint load + init need the mesh to be live).
        from ..distill import DistillConfig

        self.distill = DistillConfig(config)
        self._teacher_apply = None
        self._teacher_vars = None

        self._rng = jax.random.PRNGKey(int(get_config(config, "task.seed", 0)))
        self._train_step = None  # built lazily (needs mesh + state structure)
        self._pending_loss = None

    # ------------------------------------------------------------------
    def _build_train_step(self):
        if self.ema_enabled and getattr(self.state, "ema_params", None) is None:
            # standard EMA init: the shadow starts at a COPY of the current
            # params — aliasing the same buffers would make the donated
            # state contain each buffer twice (Execute() rejects that)
            self.state = self.state.replace(
                ema_params=jax.tree_util.tree_map(jnp.copy, self.state.params)
            )
        ema_on = self.ema_enabled
        ema_decay = self.ema_decay
        grad_accum = self.grad_accum
        norm_fn = self._norm_fn
        do_int_aug = bool(self.device_transform.get("intensity_aug"))
        int_scale = float(self.device_transform.get("int_scale", 0.1))
        int_shift = float(self.device_transform.get("int_shift", 0.1))
        int_prob = float(self.device_transform.get("int_prob", 0.5))
        do_mod_drop = bool(self.device_transform.get("modality_dropout"))
        mod_drop_prob = float(self.device_transform.get("modality_dropout_prob", 0.25))
        loss_fn = self.loss_fn
        sigmoid = self.sigmoid
        ds_levels = self.ds_levels
        moe_on = self.moe_experts > 0
        moe_w = self.moe_aux_weight
        ds_factors = []
        for i in range(1, ds_levels + 1):
            f = 1
            for s in self._model_strides[:i]:
                f *= s
            ds_factors.append(f)
        if ds_levels:
            w = np.array([0.5**k for k in range(ds_levels + 1)], np.float64)
            ds_weights = tuple(float(x) for x in (w / w.sum()))

        distill_on = self.distill.enabled
        if distill_on:
            from ..distill import build_teacher, kd_loss

            image_size = get_config(self.config, "training.data.transforms.image_size", None)
            if not image_size:
                raise ValueError(
                    "[distill] training.data.transforms.image_size is required "
                    "to initialize the teacher"
                )
            d, h, w_ = (int(x) for x in image_size)
            c = int(
                get_config(
                    self.distill.model,
                    "in_channels",
                    get_config(self.config, "model.in_channels", 1),
                )
            )
            self._teacher_apply, self._teacher_vars = build_teacher(
                self.config, self.mesh, (d, h, w_, c)
            )
            teacher_apply = self._teacher_apply
            kd_temp = self.distill.temperature
            kd_weight = self.distill.weight
            kd_focus = self.distill.focus
            self.logger.info(
                f"[distill] teacher {get_config(self.distill.model, 'name')} "
                f"loaded from {self.distill.checkpoint} "
                f"(T={kd_temp}, weight={kd_weight}, focus={kd_focus})"
            )

        def step(state, image, label, rng, n_valid, teacher_vars=None):
            image = image.astype(jnp.float32)  # upcast compact transfer dtypes
            if do_mod_drop:
                # train-time missing-modality robustness. Applied BEFORE
                # normalization so training sees exactly what deployment
                # produces for an absent modality (raw zeros pushed through
                # the normalizer — under legacy mean/std those are NOT zeros
                # in normalized space). The rng split keeps the int-aug
                # stream unchanged when this aug is off.
                rng, k_md = jax.random.split(rng)
                image = modality_dropout(k_md, image, prob=mod_drop_prob)
            if norm_fn is not None:
                image = jax.vmap(norm_fn)(image)
            if do_int_aug:
                image = rand_intensity_scale_shift(
                    rng, image, scale=int_scale, shift=int_shift, prob=int_prob
                )

            b = image.shape[0]
            # padded samples (batch tail when B % mesh size != 0) are masked
            # out of the loss via a per-sample reduction
            mask = (jnp.arange(b) < n_valid).astype(jnp.float32)

            def compute_loss(params):
                variables = {"params": params}
                mutable = []
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    mutable.append("batch_stats")
                if ds_levels or moe_on:
                    mutable.append("intermediates")
                if mutable:
                    logits, updates = state.apply_fn(
                        variables, image, train=True, mutable=mutable
                    )
                    new_bs = updates.get("batch_stats", state.batch_stats)
                    inter = updates.get("intermediates", {})
                else:
                    logits = state.apply_fn(variables, image, train=True)
                    new_bs = state.batch_stats
                lbl = label if sigmoid else label.astype(jnp.int32)

                def per_sample_of(lg_batch, lb_batch):
                    return jax.vmap(lambda lg, lb: loss_fn(lg[None], lb[None]))(
                        lg_batch, lb_batch
                    )

                per_sample = per_sample_of(logits, lbl)
                if ds_levels:
                    missing = [f"ds{k + 1}" for k in range(len(ds_factors)) if f"ds{k + 1}" not in inter]
                    if missing:
                        raise ValueError(
                            f"[SegTrainer] model.deep_supervision={ds_levels} but the "
                            f"model sowed no {missing} intermediates — the selected "
                            "model does not implement deep supervision (models/"
                            "unet3d.py does; set model.deep_supervision=0 for others)"
                        )
                    per_sample = ds_weights[0] * per_sample
                    for k, f in enumerate(ds_factors):
                        aux = inter[f"ds{k + 1}"][0]
                        # nearest-downsampled target: strided slice keeps the
                        # label crisp (no interpolated fractions) and is a
                        # free gather for XLA
                        lb_k = (
                            lbl[:, ::f, ::f, ::f, :] if sigmoid else lbl[:, ::f, ::f, ::f]
                        )
                        per_sample = per_sample + ds_weights[k + 1] * per_sample_of(aux, lb_k)
                if distill_on:
                    # frozen-teacher forward on the SAME (normalized,
                    # augmented) input the student sees; stop_gradient means
                    # XLA never builds the teacher's backward
                    t_logits = jax.lax.stop_gradient(
                        teacher_apply(teacher_vars, image, train=False)
                    )
                    per_sample = per_sample + kd_weight * kd_loss(
                        logits, t_logits, sigmoid=sigmoid, temperature=kd_temp,
                        focus=kd_focus,
                    )
                loss = jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)
                if moe_on:
                    from ...models.moe import collect_moe_aux

                    aux = collect_moe_aux(inter)
                    if not aux:
                        raise ValueError(
                            "[SegTrainer] model.moe_experts > 0 but the model "
                            "sowed no moe_aux intermediates — the selected "
                            "model has no MoE layers (models/unetr.py "
                            "moe_experts does; set model.moe_experts=0 for "
                            "others)"
                        )
                    loss = loss + moe_w * jnp.mean(jnp.stack(aux))
                return loss, new_bs

            (loss, new_bs), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
            state = state.apply_gradients(grads)
            if state.batch_stats:
                state = state.replace(batch_stats=new_bs)
            if ema_on:
                if grad_accum > 1:
                    # mini_step cycles 0..k-1 and is 0 right after an apply;
                    # decay collapses to 1.0 (identity) on accumulate-only steps
                    applied = (state.opt_state.mini_step == 0).astype(jnp.float32)
                    d = ema_decay * applied + (1.0 - applied)
                else:
                    d = ema_decay
                state = state.replace(
                    ema_params=jax.tree_util.tree_map(
                        lambda e, p: e * d + (1.0 - d) * p,
                        state.ema_params,
                        state.params,
                    )
                )
            return state, {"loss": loss}

        if self.mesh is not None:
            bsh = batch_sharding(self.mesh)
            rep = replicated(self.mesh)
            st = rep
            zero1 = bool(get_config(self.config, "training.zero1", False)) and (
                self.mesh.shape.get("data", 1) > 1
            )
            if zero1 or (moe_on and self.mesh.shape.get("expert", 1) > 1):
                from ...parallel.mesh import train_state_sharding

                # expert parallelism: MoE params + their Adam moments live
                # sharded over the expert axis (each device holds E/ep
                # experts). training.zero1 additionally shards ALL optimizer
                # moments over the data axis (ZeRO-1): each device updates
                # 1/dp of the moments and XLA all-gathers the param update.
                st = train_state_sharding(self.mesh, self.state, zero1=zero1)
                self.state = jax.device_put(self.state, st)
            in_sh = (st, bsh, bsh, rep, rep) + ((rep,) if distill_on else ())
            return jax.jit(
                step,
                in_shardings=in_sh,
                out_shardings=(st, rep),
                donate_argnums=(0,),
            )
        return jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def eval_state(self):
        if (
            self.ema_enabled
            and self.ema_eval
            and getattr(self.state, "ema_params", None) is not None
        ):
            return self.state.replace(params=self.state.ema_params)
        return self.state

    # ------------------------------------------------------------------
    def _check_shapes(self, image: np.ndarray, label: np.ndarray) -> None:
        if self.softmax:
            if label.ndim != image.ndim - 1:
                raise ValueError(
                    f"[SegTrainer/softmax] Expect y as [B,spatial...] with ndim={image.ndim - 1}, "
                    f"got y={tuple(label.shape)}, image={tuple(image.shape)}."
                )
            if tuple(label.shape[1:]) != tuple(image.shape[1:-1]):
                raise ValueError(
                    f"[SegTrainer/softmax] Spatial mismatch: y={tuple(label.shape)} vs "
                    f"image={tuple(image.shape)}."
                )
        else:
            if label.ndim != image.ndim:
                raise ValueError(
                    f"[SegTrainer/sigmoid] Expect y as [B,spatial...,C] with ndim={image.ndim}, "
                    f"got y={tuple(label.shape)}. Dataset must output channel-last masks "
                    f"(binary => [B,...,1])."
                )
            if tuple(label.shape[:-1]) != tuple(image.shape[:-1]):
                raise ValueError(
                    f"[SegTrainer/sigmoid] Spatial mismatch: y={tuple(label.shape)} vs "
                    f"image={tuple(image.shape)}."
                )

    def _wrap_loader(self, loader):
        if getattr(loader, "device_resident", False):
            return loader  # batches already live on device (DeviceCachedLoader)
        from ...data.prefetch import prefetch_to_device

        return prefetch_to_device(
            loader,
            self.mesh,
            image_transfer_dtype=self._transfer_dtype,
            label_transfer_dtype=np.uint8 if self.sigmoid else None,
        )

    def run_step(self, batch: Dict[str, Any]) -> Dict[str, float]:
        image, label = batch["image"], batch["label"]
        self._check_shapes_meta(image, label)

        if self._train_step is None:
            self._train_step = self._build_train_step()

        self._rng, step_key = jax.random.split(self._rng)

        if "_n_valid" in batch:
            # already padded + device-put by the prefetcher
            n_valid = int(batch["_n_valid"])
        else:
            image = np.asarray(image, dtype=np.float32)
            label = np.asarray(label)
            n_valid = image.shape[0]
            if self.mesh is not None:
                padded, n_valid = pad_batch_to_multiple(
                    {"image": image, "label": label}, data_axis_size(self.mesh)
                )
                sharded = shard_batch(padded, self.mesh)
                image, label = sharded["image"], sharded["label"]

        step_args = (self.state, image, label, step_key, np.int32(n_valid))
        if self.distill.enabled:
            step_args = step_args + (self._teacher_vars,)
        self.state, metrics = self._train_step(*step_args)
        # Defer the device->host loss sync by one step: returning last step's
        # loss keeps the dispatch queue full (step k+1 is enqueued while step
        # k executes). flush_step_metrics() drains the final step at epoch end.
        prev = self._pending_loss
        self._pending_loss = metrics["loss"]
        return {"loss": float(prev)} if prev is not None else {}

    def flush_step_metrics(self):
        if self._pending_loss is None:
            return {}
        loss = float(self._pending_loss)
        self._pending_loss = None
        return {"loss": loss}

    def _check_shapes_meta(self, image, label) -> None:
        """Shape-contract checks on array metadata (no host transfer)."""

        class _V:
            def __init__(self, shape):
                self.shape = tuple(shape)
                self.ndim = len(shape)

        self._check_shapes(_V(image.shape), _V(label.shape))

    # ------------------------------------------------------------------
    def _is_best_model(self, eval_stats: Dict[str, float]) -> bool:
        """Delegate to the strategy's is_best_model, else min val loss
        (reference: seg_trainer.py:85-95)."""
        if hasattr(self.evaluation_strategy, "is_best_model"):
            return self.evaluation_strategy.is_best_model(eval_stats, self.best_metrics)
        if eval_stats:
            current = eval_stats.get("loss", 0.0)
            best = self.best_metrics.get("loss", float("inf"))
            self.logger.info(f"Current loss: {current:.4f}, Best loss: {best:.4f}")
            return current < best
        return False
