"""Experiment orchestration.

Public API parity with the reference manager (reference:
src/core/experiment_manager.py:31-396): ``ExperimentManager(cfg)`` then
``setup_model / setup_data / setup_optimizer / setup_scheduler /
setup_trainer / train``. Differences are TPU-native:

  - device selection builds a jax.sharding.Mesh (data axis over all selected
    chips) instead of picking a cuda device; DataParallel is subsumed by the
    jitted SPMD step
  - the "model" is a flax Module + initialized variables wrapped in a
    TrainState; optimizers are optax with the same no-decay param-group rules
  - seeding returns an explicit root PRNG key
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..conf.node import ConfigNode
from ..parallel.mesh import mesh_from_config, replicated
from ..registry import get_dataset_builder, get_evaluation_strategy, get_model
from ..utils.config import get_config, require_config
from ..utils.logger import get_logger
from ..utils.metrics import set_random_seed
from .hooks import CheckpointHook, EarlyStoppingHook, MemoryMonitorHook, MetricsLoggerHook, TimerHook
from .optim import EpochScheduler, build_optimizer
from .train_state import TrainState, param_count
from .trainers.seg_trainer import SegTrainer

# Import for registration side effects (same pattern as reference main.py:18-20).
from .. import data as _data  # noqa: F401
from .. import evaluation as _evaluation  # noqa: F401
from .. import models as _models  # noqa: F401


class ExperimentManager:
    def __init__(self, config: ConfigNode):
        if not isinstance(config, ConfigNode):
            raise TypeError("ExperimentManager expects a ConfigNode configuration")
        self.config = config
        self.logger = get_logger()

        from ..utils.jax_setup import enable_compilation_cache

        enable_compilation_cache()

        seed = require_config(config, "task.seed")
        deterministic = str(get_config(config, "task.deterministic", "practical"))
        self.root_key = set_random_seed(seed, deterministic)

        self.task_name = require_config(config, "task.name")
        self.eval_strategy_name = get_config(config, "task.eval_strategy")

        # Numerical sanitizer (SURVEY.md §5 sanitizers row): aborts with a
        # traceback at the first NaN/Inf produced under jit.
        if bool(get_config(config, "training.debug_nans", False)):
            jax.config.update("jax_debug_nans", True)
            self.logger.info("jax_debug_nans enabled")

        from ..parallel.distributed import maybe_initialize_distributed

        maybe_initialize_distributed()  # no-op unless a multi-host launch is detected
        self.mesh = mesh_from_config(config)

        self.module = None
        self.variables = None
        self.state: Optional[TrainState] = None
        self.tx = None
        self.base_lr: Optional[float] = None
        self.scheduler: Optional[EpochScheduler] = None
        self.trainer = None

        self.train_loader = None
        self.val_loader = None
        self.test_loader = None

        self.logger.info(f"ExperimentManager up — task '{self.task_name}'")
        self.logger.info(f"Random seed: {seed} | deterministic: {deterministic}")

    # ------------------------------------------------------------------
    def _input_shape(self) -> Tuple[int, ...]:
        """Per-sample input shape [D,H,W,C] from transforms + model config."""
        image_size = get_config(self.config, "training.data.transforms.image_size", None)
        if image_size is None:
            raise ValueError(
                "training.data.transforms.image_size ([D,H,W]) is required to "
                "initialize model parameters"
            )
        d, h, w = (int(x) for x in image_size)
        c = int(get_config(self.config, "model.in_channels", get_config(self.config, "model.num_modalities", 1)))
        return (d, h, w, c)

    def setup_model(self):
        model_cfg = require_config(self.config, "model")
        model_name = require_config(model_cfg, "name", type_=str)
        model_cls = get_model(model_name)

        compute_dtype = str(get_config(self.config, "training.compute_dtype", "bfloat16"))
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            compute_dtype
        ]
        remat = get_config(self.config, "training.remat", False)
        if not isinstance(remat, (bool, int)):
            remat = bool(remat)

        self.module = model_cls.from_config(model_cfg, dtype=dtype, remat=remat)

        d, h, w, c = self._input_shape()
        dummy = jnp.zeros((1, d, h, w, c), jnp.float32)
        init_key, self.root_key = jax.random.split(self.root_key)
        with self.mesh:
            self.variables = jax.jit(
                lambda k, x: self.module.init(k, x, train=True),
                out_shardings=replicated(self.mesh),
            )(init_key, dummy)

        # model.pretrained is honored or fails loudly — never silently
        # ignored (the reference resolves torchvision ImageNet weights,
        # reference src/models/resnet.py:16-36; this offline build ports a
        # user-supplied torch state_dict instead, models/pretrained.py).
        if bool(get_config(model_cfg, "pretrained", False)):
            src_path = get_config(model_cfg, "pretrained_source", None)
            if not src_path:
                raise ValueError(
                    "model.pretrained=true but model.pretrained_source is not "
                    "set — this environment cannot download torchvision "
                    "weights; save a torch state_dict (torch.save(model."
                    "state_dict(), p)) and point model.pretrained_source at it"
                )
            from ..models.pretrained import apply_pretrained, port_pretrained_variables

            ported = port_pretrained_variables(model_name, str(src_path))
            merged = apply_pretrained(jax.device_get(self.variables), ported, model_name)
            self.variables = jax.device_put(merged, replicated(self.mesh))

        n_params = param_count(self.variables["params"])
        self.logger.info(
            f"Model created: {model_name} ({n_params / 1e6:.2f}M params, "
            f"compute_dtype={compute_dtype}, remat={remat})"
        )
        return self.module

    # ------------------------------------------------------------------
    def get_dataset_builder_for_task(self):
        try:
            builder_cls = get_dataset_builder(self.task_name)
        except KeyError:
            builder_cls = get_dataset_builder("default")
        return builder_cls(self.config)

    def build_clean_dataset(self, split: str = "train"):
        return self.get_dataset_builder_for_task().get_dataset(split)

    def setup_train_data(self):
        builder = self.get_dataset_builder_for_task()

        train_ds = builder.get_dataset("train")
        val_ds = builder.get_dataset("val")
        test_ds = builder.get_dataset("test")

        if bool(get_config(self.config, "training.device_cache", False)):
            # decode once, stage the whole training set in HBM, gather batches
            # on device — removes per-step decode + H2D entirely (the training
            # sets here are ~1-2 GB in f16 vs 16 GB HBM/chip)
            from ..data.device_cache import DeviceCachedLoader

            args = builder.default_loader_args("train")
            self.train_loader = DeviceCachedLoader(
                train_ds,
                batch_size=args["batch_size"],
                shuffle=args["shuffle"],
                drop_last=args["drop_last"],
                seed=args["seed"],
                mesh=self.mesh,
                num_workers=args["num_workers"],
                shard_store=bool(get_config(self.config, "training.device_cache_sharded", False)),
                logger=self.logger,
            )
        else:
            self.train_loader = builder.get_loader("train", dataset=train_ds)
        if val_ds is None or len(val_ds) == 0:
            self.val_loader = None
            self.logger.warning("val dataset is empty; skip validation.")
        else:
            self.val_loader = builder.get_loader("val", dataset=val_ds)
        self.test_loader = builder.get_loader("test", dataset=test_ds) if test_ds is not None else None

        def n(dl):
            try:
                return len(dl.dataset)
            except Exception:
                return "?"

        self.logger.info(
            f"Loaders ready for '{self.task_name}': "
            f"train={n(self.train_loader)} val={n(self.val_loader) if self.val_loader else 0} "
            f"test={n(self.test_loader) if self.test_loader else 0}"
        )
        self._builder = builder
        return self.train_loader, self.val_loader, self.test_loader

    def setup_test_data(self):
        builder = self.get_dataset_builder_for_task()
        self.test_loader = builder.get_loader("test")
        self._builder = builder
        return self.test_loader

    def setup_data(self, mode: str = "train"):
        mode = str(mode).lower()
        if mode == "train":
            return self.setup_train_data()
        if mode == "test":
            return self.setup_test_data(), None
        raise ValueError(f"Unknown mode: {mode}. Expected 'train' or 'test'.")

    # ------------------------------------------------------------------
    def setup_optimizer(self):
        if self.variables is None:
            raise ValueError("Model must be setup before optimizer")
        training_cfg = require_config(self.config, "training")
        self.tx, self.base_lr = build_optimizer(training_cfg, self.variables["params"])

        with self.mesh:
            self.state = TrainState.create(
                apply_fn=self.module.apply,
                params=self.variables["params"],
                batch_stats=self.variables.get("batch_stats", {}),
                tx=self.tx,
            )
        opt_name = get_config(training_cfg, "optimizer", "sgd")
        self.logger.info(f"Optimizer created (primary): {opt_name} lr={self.base_lr}")
        return self.tx

    def setup_scheduler(self):
        if self.tx is None:
            raise ValueError("Optimizer must be setup before scheduler")
        training_cfg = require_config(self.config, "training")
        self.scheduler = EpochScheduler(training_cfg, self.base_lr)
        if self.scheduler.enabled:
            self.logger.info(f"Scheduler created: {self.scheduler.name}")
        return self.scheduler

    # ------------------------------------------------------------------
    def setup_hooks(self, run_dir: Optional[str] = None):
        hooks = [TimerHook()]

        run_dir = run_dir or get_config(self.config, "task.save_dir", "./outputs")
        ckpt_dir = os.path.join(run_dir, "checkpoints")
        model_save_freq = int(get_config(self.config, "training.model_save_freq", 1))
        model_save_start = int(get_config(self.config, "training.model_save_start", 50))
        # "msgpack" (single-host gather) or "orbax" (sharded, multi-host-safe)
        ckpt_format = str(get_config(self.config, "training.checkpoint_format", "msgpack"))
        self.checkpoint_hook = CheckpointHook(
            ckpt_dir, model_save_freq, model_save_start, fmt=ckpt_format
        )
        hooks.append(self.checkpoint_hook)

        hooks.append(MemoryMonitorHook())
        hooks.append(MetricsLoggerHook())

        prof = get_config(self.config, "training.profile", None)
        if prof is not None and bool(get_config(prof, "enabled", False)):
            from .hooks import ProfilerHook

            hooks.append(
                ProfilerHook(
                    log_dir=str(get_config(prof, "log_dir", os.path.join(run_dir, "profile"))),
                    start_step=int(get_config(prof, "start_step", 10)),
                    num_steps=int(get_config(prof, "num_steps", 5)),
                )
            )

        es = get_config(self.config, "training.early_stopping", None)
        if es is not None and bool(get_config(es, "enabled", False)):
            hooks.append(
                EarlyStoppingHook(
                    metric=str(get_config(es, "metric", "loss")),
                    mode=str(get_config(es, "mode", "min")),
                    patience=int(get_config(es, "patience", 10)),
                    min_delta=float(get_config(es, "min_delta", 0.0)),
                )
            )

        self.trainer.register_hooks(hooks)
        self.logger.info(f"Hook set attached ({len(hooks)} hooks)")

    def setup_trainer(self, run_dir: Optional[str] = None):
        if self.eval_strategy_name is None:
            evaluation_strategy = None
        else:
            evaluation_cls = get_evaluation_strategy(self.eval_strategy_name)
            evaluation_strategy = evaluation_cls(self.config)

        task_lower = str(self.task_name).lower()
        is_seg = "seg" in task_lower or "brats" in task_lower or "hecktor21" in task_lower
        if not is_seg:
            raise ValueError(f"Unknown trainer type: {self.task_name}")

        device_transform = None
        builder = getattr(self, "_builder", None)
        if builder is not None and hasattr(builder, "build_transform"):
            device_transform = builder.build_transform("train").device_spec()

        self.trainer = SegTrainer(
            self.config,
            mesh=self.mesh,
            evaluation_strategy=evaluation_strategy,
            device_transform=device_transform,
        )
        self.trainer.setup(self.state, evaluation_strategy, self.scheduler)
        self.setup_hooks(run_dir)

        resume = get_config(self.config, "training.resume", None)
        if resume:
            self.trainer.start_epoch = self.checkpoint_hook.load(str(resume))

        self.logger.info(
            f"{type(self.trainer).__name__} ready for '{self.task_name}'"
        )

    # ------------------------------------------------------------------
    def train(self, epochs: int) -> Dict[str, List]:
        if self.trainer is None:
            raise ValueError("Trainer must be setup before training")
        self.logger.info(f"Launching {epochs}-epoch training run")
        eval_on_train = bool(get_config(self.config, "training.eval_on_train", False))
        with self.mesh:
            results = self.trainer.train(
                epochs=int(epochs),
                train_loader=self.train_loader,
                val_loader=self.val_loader,
                test_loader=self.test_loader,
                eval_on_train=eval_on_train,
            )
        # the jitted train step DONATES the TrainState buffers, so the state
        # this manager handed to the trainer is dead after step 1 — sync the
        # live (post-training) state back so post-train consumers (TTA
        # evaluation, export, adapt.py-style flows) see real parameters
        if getattr(self.trainer, "state", None) is not None:
            self.state = self.trainer.state
        self.logger.info("Training completed")
        return results
