"""Training hooks.

Same hook set as the reference (reference: src/core/hooks.py:14-174) —
Timer, Checkpoint, LearningRateScheduler (no-op here: the trainer owns
epoch LR stepping), MemoryMonitor, MetricsLogger — plus an EarlyStopping hook
implementing the ``training.early_stopping`` config block the reference reads
from nowhere (reference: configs/training/default.yaml:76-80).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax

from .checkpoint import load_checkpoint, save_checkpoint, save_checkpoint_sharded
from .trainer_base import HookBase


class TimerHook(HookBase):
    def before_train(self):
        self.start_time = time.time()

    def after_train(self):
        elapsed = time.time() - self.start_time
        self.trainer.logger.info(f"Total training time: {elapsed:.2f} seconds")

    def before_train_epoch(self):
        self.epoch_start_time = time.time()

    def after_train_epoch(self):
        elapsed = time.time() - self.epoch_start_time
        self.trainer.logger.info(f"Epoch {self.trainer.epoch} took {elapsed:.2f} seconds")


class CheckpointHook(HookBase):
    """Periodic + best-on-val checkpointing (reference: hooks.py:32-93).

    State saved: epoch, TrainState (params/batch_stats/opt_state/step),
    scheduler state, best_metrics.
    """

    def __init__(self, save_dir: str, save_freq: int = 1, save_start: int = 10,
                 fmt: str = "msgpack"):
        self.save_dir = save_dir
        self.save_freq = int(save_freq)
        self.save_start = int(save_start)
        fmt = str(fmt).lower()
        if fmt not in ("msgpack", "orbax", "sharded"):
            raise ValueError(f"[CheckpointHook] unknown checkpoint format: {fmt}")
        self.fmt = "orbax" if fmt in ("orbax", "sharded") else "msgpack"
        os.makedirs(self.save_dir, exist_ok=True)

    def after_train_epoch(self):
        epoch = self.trainer.epoch
        if (epoch + 1) % self.save_freq == 0 and epoch + 1 >= self.save_start:
            self.save(epoch, is_best=False)

    def after_val(self, is_best: bool):
        if is_best:
            self.save(self.trainer.epoch, is_best=True)
            self.trainer.logger.info("Best model saved based on validation metrics.")

    def save(self, epoch: int, is_best: bool):
        name = "best_model" if is_best else f"checkpoint_epoch_{epoch}"
        path = os.path.join(self.save_dir, name)
        extra = {
            "epoch": int(epoch),
            "best_metrics": dict(self.trainer.best_metrics),
        }
        if self.trainer.scheduler is not None:
            extra["scheduler"] = self.trainer.scheduler.state_dict()
        if self.fmt == "orbax":
            save_checkpoint_sharded(path, self.trainer.state, extra)
        else:
            save_checkpoint(path, self.trainer.state, extra)
        self.trainer.logger.info(f"Checkpoint saved to {path}")

    def load(self, path: str) -> int:
        """Restore trainer state; returns the epoch to resume from."""
        if not any(os.path.exists(path + s) for s in ("", ".msgpack", ".orbax")):
            self.trainer.logger.warning(f"Checkpoint not found at {path}, starting from scratch.")
            return 0
        state, extra = load_checkpoint(path, self.trainer.state)
        self.trainer.state = state
        self.trainer.best_metrics = dict(extra.get("best_metrics", {}))
        if self.trainer.scheduler is not None and "scheduler" in extra:
            self.trainer.scheduler.load_state_dict(extra["scheduler"])
        start_epoch = int(extra.get("epoch", -1)) + 1
        self.trainer.logger.info(f"Checkpoint loaded from {path}, resuming from epoch {start_epoch}")
        return start_epoch


class LearningRateSchedulerHook(HookBase):
    """Kept for API parity; LR stepping is owned by TrainerBase.train_epoch
    (the reference version would double-step — hooks.py:96-102 note)."""


class MemoryMonitorHook(HookBase):
    """Logs device HBM usage every N steps (TPU equivalent of the reference's
    CUDA allocated/reserved MB — hooks.py:105-115)."""

    def __init__(self, every_n: int = 100):
        self.every_n = int(every_n)

    def after_train_step(self):
        if self.trainer.iter % self.every_n != 0:
            return
        try:
            dev = jax.devices()[0]
            stats = dev.memory_stats()
            if stats:
                used = stats.get("bytes_in_use", 0) / 1024**2
                limit = stats.get("bytes_limit", 0) / 1024**2
                self.trainer.logger.debug(
                    f"Device memory: in_use={used:.2f}MB, limit={limit:.2f}MB"
                )
        except Exception:
            pass


class MetricsLoggerHook(HookBase):
    """Formatted epoch summaries (reference: hooks.py:118-174)."""

    def __init__(self, log_every_n_epochs: int = 1):
        self.log_every_n_epochs = int(log_every_n_epochs)

    def on_epoch_end(self, epoch, train_stats, eval_stats, is_best):
        if epoch % self.log_every_n_epochs != 0:
            return
        train_str = self._fmt("Train", train_stats)
        eval_str = self._fmt("Eval", eval_stats)
        self.trainer.logger.info(f"Epoch {epoch}: {train_str} | {eval_str}")
        if is_best and eval_stats:
            key, value = next(iter(eval_stats.items()))
            self.trainer.logger.info(f"New best model: {key}: {value:.4f}")

    @staticmethod
    def _fmt(prefix: str, metrics: Dict[str, float]) -> str:
        if not metrics:
            return f"{prefix}: No metrics"
        parts = []
        for key, value in metrics.items():
            if key == "lr":
                parts.append(f"LR: {value:.6f}")
            elif "loss" in key.lower():
                parts.append(f"{key.replace('_', ' ').title()}: {value:.4f}")
            else:
                parts.append(f"{key.replace('_', ' ').title()}: {value:.4f}")
        return f"{prefix}: {', '.join(parts)}"


class ProfilerHook(HookBase):
    """Captures a jax.profiler trace for a chosen span of training steps.

    The TPU-native upgrade of the reference's wall-clock-only tracing
    (SURVEY.md §5 row 1): writes an XPlane trace viewable in TensorBoard /
    xprof, covering steps [start_step, start_step + num_steps).
    """

    def __init__(self, log_dir: str, start_step: int = 10, num_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = int(start_step)
        self.num_steps = int(num_steps)
        self._active = False
        self._done = False

    def before_train_step(self):
        if self._done or self._active:
            return
        if self.trainer.iter >= self.start_step:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def after_train_step(self):
        if self._active and self.trainer.iter >= self.start_step + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            self.trainer.logger.info(f"Profiler trace written to {self.log_dir}")

    def after_train(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class EarlyStoppingHook(HookBase):
    """Stops training when the monitored eval metric stops improving.

    Implements the reference's dormant ``training.early_stopping`` block
    (configs/training/default.yaml:76-80) by raising StopIteration, which
    TrainerBase.train catches as a clean early stop."""

    def __init__(
        self,
        metric: str = "loss",
        mode: str = "min",
        patience: int = 10,
        min_delta: float = 0.0,
    ):
        self.metric = metric
        self.mode = mode
        self.patience = int(patience)
        self.min_delta = float(min_delta)
        self.best: Optional[float] = None
        self.bad = 0

    def on_epoch_end(self, epoch, train_stats, eval_stats, is_best):
        if not eval_stats or self.metric not in eval_stats:
            return
        value = float(eval_stats[self.metric])
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best - self.min_delta)
            or (self.mode == "max" and value > self.best + self.min_delta)
        )
        if improved:
            self.best = value
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                raise StopIteration(
                    f"early stopping: no {self.metric} improvement for {self.bad} evals"
                )
