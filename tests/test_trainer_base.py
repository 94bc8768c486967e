"""TrainerBase unit tests: eval/test scheduling, hooks lifecycle, early stop."""

import numpy as np
import pytest

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.trainer_base import HookBase, TrainerBase
from multimodal_tta_tpu.core.hooks import EarlyStoppingHook


class _ToyTrainer(TrainerBase):
    """Minimal concrete trainer: counts steps, no jax."""

    def __init__(self, config):
        super().__init__(config)
        self.state = object()
        self.steps = 0

    def run_step(self, batch):
        self.steps += 1
        return {"loss": 1.0 / self.steps}


class _FakeStrategy:
    def __init__(self, losses):
        self.losses = list(losses)
        self.calls = 0

    def evaluate_epoch(self, state, loader, mesh=None, **kw):
        self.calls += 1
        return {"loss": self.losses.pop(0) if self.losses else 0.0, "avg_dc": 0.5}


def cfg(schedule=None, do_test=False):
    c = {
        "training": {
            "eval_test": {
                "start_epoch": 0,
                "every_n_epochs": 1,
                "run_last": True,
                "do_val": True,
                "do_test": do_test,
            }
        }
    }
    if schedule:
        c["training"]["eval_test"].update(schedule)
    return ConfigNode(c)


class TestEvalSchedule:
    """Parity with reference trainer_base.py:154-175 (0-based epochs)."""

    def test_every_epoch(self):
        t = _ToyTrainer(cfg())
        assert all(t._should_run_eval_test(e, 10) for e in range(10))

    def test_every_n(self):
        t = _ToyTrainer(cfg({"every_n_epochs": 5}))
        runs = [e for e in range(20) if t._should_run_eval_test(e, 20)]
        assert runs == [0, 5, 10, 15, 19]  # run_last forces 19

    def test_start_epoch(self):
        t = _ToyTrainer(cfg({"start_epoch": 3, "every_n_epochs": 2, "run_last": False}))
        runs = [e for e in range(10) if t._should_run_eval_test(e, 10)]
        assert runs == [3, 5, 7, 9]

    def test_run_last_forced(self):
        t = _ToyTrainer(cfg({"every_n_epochs": 100, "run_last": True}))
        assert t._should_run_eval_test(6, 7)
        assert not t._should_run_eval_test(5, 7)

    def test_invalid_interval_treated_as_1(self):
        t = _ToyTrainer(cfg({"every_n_epochs": 0}))
        assert t._should_run_eval_test(1, 5)


class TestTrainLoop:
    def _loader(self, n=3):
        return [{"x": i} for i in range(n)]

    def test_history_and_hooks(self):
        events = []

        class Recorder(HookBase):
            def before_train(self):
                events.append("before_train")

            def after_train(self):
                events.append("after_train")

            def before_train_epoch(self):
                events.append("bte")

            def after_train_epoch(self):
                events.append("ate")

            def on_epoch_end(self, epoch, train_stats, eval_stats, is_best):
                events.append(f"end{epoch}")

        t = _ToyTrainer(cfg())
        strategy = _FakeStrategy([0.5, 0.4])
        t.setup(object(), strategy)
        t.register_hooks([Recorder()])
        out = t.train(2, self._loader(), val_loader=self._loader())

        assert len(out["train_history"]) == 2
        assert len(out["eval_history"]) == 2
        assert out["eval_history"][0]["loss"] == 0.5
        assert events[0] == "before_train" and events[-1] == "after_train"
        assert "end0" in events and "end1" in events

    def test_eval_history_empty_when_not_scheduled(self):
        t = _ToyTrainer(cfg({"every_n_epochs": 2, "run_last": False}))
        t.setup(object(), _FakeStrategy([0.5, 0.4]))
        out = t.train(3, self._loader(), val_loader=self._loader())
        assert out["eval_history"][1] == {}  # epoch 1 skipped

    def test_early_stopping_raises_stop(self):
        t = _ToyTrainer(cfg())
        t.setup(object(), _FakeStrategy([1.0, 1.1, 1.2, 1.3, 1.4, 1.5]))
        t.register_hooks([EarlyStoppingHook(metric="loss", mode="min", patience=1)])
        out = t.train(6, self._loader(), val_loader=self._loader())
        # stopped before finishing all 6 epochs
        assert len(out["train_history"]) < 6

    def test_test_loader_called_when_enabled(self):
        t = _ToyTrainer(cfg(do_test=True))
        strategy = _FakeStrategy([0.5, 0.4, 0.3, 0.2])
        t.setup(object(), strategy)
        t.train(2, self._loader(), val_loader=self._loader(), test_loader=self._loader())
        assert strategy.calls == 4  # 2 val + 2 test


class TestBestModelSelection:
    def test_strategy_best_metric_max(self):
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy

        strat = SegmentationEvaluationStrategy(
            ConfigNode({"evaluation": {"best_metric": "avg_dc", "best_mode": "max"}})
        )
        assert strat.is_best_model({"avg_dc": 0.7}, {})
        assert strat.is_best_model({"avg_dc": 0.8}, {"avg_dc": 0.7})
        assert not strat.is_best_model({"avg_dc": 0.6}, {"avg_dc": 0.7})

    def test_strategy_default_min_loss(self):
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy

        strat = SegmentationEvaluationStrategy(ConfigNode({}))
        assert strat.is_best_model({"loss": 1.0}, {})
        assert not strat.is_best_model({"loss": 2.0}, {"loss": 1.0})


def test_zero_batch_epoch_reports_nan_loss():
    """A zero-batch epoch (drop_last discarding everything) must be visibly
    broken in history — an empty meter's 0.0 reads as perfect convergence."""
    import math

    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.core.trainer_base import TrainerBase

    class T(TrainerBase):
        def run_step(self, batch):
            return {"loss": 1.0}

    t = T(ConfigNode({"training": {}}))
    t.state = object()  # any non-None state; run_step is stubbed
    metrics = t.train_epoch(0, [])
    assert math.isnan(metrics["loss"])


class TestGwdlTraining:
    def test_seg_trainer_softmax_gwdl_step(self):
        """SegTrainer with criterion name=gwdl (softmax label maps) runs a
        real jitted train step and the loss decreases when overfitting one
        batch — the GWDL gradient path works through the full trainer."""
        import numpy as np

        import jax
        import jax.numpy as jnp
        import optax

        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.core.trainers.seg_trainer import SegTrainer
        from multimodal_tta_tpu.models import UNet3D

        cfg = ConfigNode(
            {
                "task": {"seed": 0},
                "training": {
                    "criterion": {
                        "name": "gwdl",
                        "softmax": True,
                        "distance_matrix": [[0.0, 1.0, 1.0], [1.0, 0.0, 0.5], [1.0, 0.5, 0.0]],
                    }
                },
            }
        )
        trainer = SegTrainer(cfg, mesh=None)
        m = UNet3D(in_channels=2, num_classes=3, channels=(4, 8, 16, 32, 64),
                   strides=(2, 2, 2, 2), num_res_units=1)
        x = jnp.zeros((2, 16, 16, 16, 2))
        variables = m.init(jax.random.PRNGKey(0), x, train=True)
        trainer.state = TrainState.create(
            apply_fn=m.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=optax.adam(3e-3),
        )
        rng = np.random.RandomState(0)
        batch = {
            "image": rng.randn(2, 16, 16, 16, 2).astype(np.float32),
            "label": rng.randint(0, 3, (2, 16, 16, 16)).astype(np.int32),
        }
        losses = []
        for _ in range(6):
            trainer.run_step(batch)
            losses.append(trainer.flush_step_metrics()["loss"])
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
