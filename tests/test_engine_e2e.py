"""End-to-end engine tests on a CPU-simulated mesh with synthetic NIfTI data."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.conf import ConfigNode, compose
from multimodal_tta_tpu.core import ExperimentManager
from multimodal_tta_tpu.core.optim import (
    EpochScheduler,
    build_optimizer,
    get_learning_rate,
    no_decay_mask,
    set_learning_rate,
)
from multimodal_tta_tpu.core.train_state import TrainState

from fixtures import make_hecktor_fixture

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO_ROOT, "configs")


def small_cfg(manifest, tmp_path, extra=()):
    overrides = [
        "hydra.job.chdir=false",
        f"dataset.manifest_csv={manifest}",
        "dataset.expected_shape=[16,16,16]",
        "dataset.val_per_center=1",
        "training.epochs=2",
        "training.batch_size=2",
        "training.eval_batch_size=2",
        "training.num_workers=0",
        "training.compute_dtype=float32",
        "training.data.transforms.image_size=[16,16,16]",
        "training.eval_test.every_n_epochs=1",
        "training.eval_test.do_test=true",
        "training.model_save_start=1",
        "training.model_save_freq=1",
        "model.channels=[4,8,16,32,64]",
        "model.num_res_units=1",
        "training.optimizer=adam",
        "training.optimizers.adam.lr=1e-3",
        f"task.save_dir={tmp_path}/outputs",
    ] + list(extra)
    return compose(CONFIG_DIR, "config", overrides)


@pytest.fixture(scope="module")
def hecktor_manifest(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hecktor"))
    return make_hecktor_fixture(root, shape=(16, 16, 16), centers={"CHUS": 3, "CHUM": 4, "CHGJ": 4})


class TestOptim:
    def _params(self):
        return {
            "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
            "norm_layer": {"scale": jnp.ones((4,))},
        }

    def test_no_decay_mask(self):
        mask = no_decay_mask(self._params(), ["bias", "norm"], True)
        assert mask["dense"]["kernel"] is True
        assert mask["dense"]["bias"] is False
        assert mask["norm_layer"]["scale"] is False

    def test_build_and_set_lr(self):
        cfg = ConfigNode(
            {
                "optimizer": "adam",
                "optimizers": {"adam": {"lr": 1e-3, "weight_decay": 1e-4}},
                "param_groups": {"no_decay_keys": ["bias"], "treat_1d_as_no_decay": True},
            }
        )
        params = self._params()
        tx, lr = build_optimizer(cfg, params)
        assert lr == pytest.approx(1e-3)
        state = TrainState.create(apply_fn=lambda *a, **k: None, params=params, tx=tx)
        assert get_learning_rate(state.opt_state) == pytest.approx(1e-3)
        set_learning_rate(state.opt_state, 5e-4)
        assert get_learning_rate(state.opt_state) == pytest.approx(5e-4)

    def test_sgd_momentum_updates(self):
        cfg = ConfigNode({"optimizer": "sgd", "optimizers": {"sgd": {"lr": 0.1, "momentum": 0.9}}})
        params = {"w": jnp.ones((3,))}
        tx, _ = build_optimizer(cfg, params)
        state = TrainState.create(apply_fn=None, params=params, tx=tx)
        grads = {"w": jnp.ones((3,))}
        state = state.apply_gradients(grads)
        assert np.allclose(np.asarray(state.params["w"]), 0.9)
        assert int(state.step) == 1

    def test_schedulers(self):
        base = ConfigNode({"epochs": 100})
        base["scheduler"] = {"name": "multistep", "args": {"milestones": [10, 20], "gamma": 0.1}}
        s = EpochScheduler(base, 1.0)
        assert s.lr_for_epoch(0) == 1.0
        assert s.lr_for_epoch(10) == pytest.approx(0.1)
        assert s.lr_for_epoch(25) == pytest.approx(0.01)

        base["scheduler"] = {"name": "step", "args": {"step_size": 10, "gamma": 0.5}}
        s = EpochScheduler(base, 1.0)
        assert s.lr_for_epoch(9) == 1.0
        assert s.lr_for_epoch(10) == 0.5

        base["scheduler"] = {"name": "cosine"}
        s = EpochScheduler(base, 1.0)
        assert s.lr_for_epoch(0) == pytest.approx(1.0)
        assert s.lr_for_epoch(100) == pytest.approx(0.0, abs=1e-6)

        base["scheduler"] = {"name": "poly", "args": {"power": 0.9}}
        s = EpochScheduler(base, 1.0)
        assert s.lr_for_epoch(0) == pytest.approx(1.0)
        assert s.lr_for_epoch(50) == pytest.approx(0.5 ** 0.9)
        assert s.lr_for_epoch(100) == pytest.approx(0.0, abs=1e-9)

        # linear warmup composes with any schedule (here: poly)
        base["scheduler"] = {"name": "poly", "args": {"power": 1.0, "warmup_epochs": 5}}
        s = EpochScheduler(base, 1.0)
        assert s.enabled
        assert s.lr_for_epoch(0) == pytest.approx(0.2)
        assert s.lr_for_epoch(4) == pytest.approx(1.0)
        assert s.lr_for_epoch(5) == pytest.approx(0.95)  # schedule index keeps running

        # warmup alone (name "none") still schedules the ramp
        base["scheduler"] = {"name": "none", "args": {"warmup_epochs": 4}}
        s = EpochScheduler(base, 1.0)
        assert s.enabled
        assert s.lr_for_epoch(1) == pytest.approx(0.5)
        assert s.lr_for_epoch(10) == pytest.approx(1.0)

        base["scheduler"] = {"name": "reduce_on_plateau", "args": {"reduce_on_plateau": {"factor": 0.1, "patience": 1}}}
        s = EpochScheduler(base, 1.0)
        assert s.lr_for_epoch(0, 1.0) == 1.0
        assert s.lr_for_epoch(1, 1.1) == 1.0  # bad 1 (== patience, not yet)
        assert s.lr_for_epoch(2, 1.2) == pytest.approx(0.1)  # bad 2 > patience -> reduced
        assert s.lr_for_epoch(3, 1.3) == pytest.approx(0.1)


class TestEndToEnd:
    def test_train_eval_checkpoint(self, hecktor_manifest, tmp_path):
        cfg = small_cfg(hecktor_manifest, tmp_path)
        mgr = ExperimentManager(cfg)
        mgr.setup_model()
        mgr.setup_data("train")
        mgr.setup_optimizer()
        mgr.setup_scheduler()
        mgr.setup_trainer(str(tmp_path / "run"))

        results = mgr.train(2)
        assert len(results["train_history"]) == 2
        losses = [h["loss"] for h in results["train_history"]]
        assert all(np.isfinite(l) for l in losses)
        # eval ran every epoch with the metric schema
        ev = results["eval_history"][-1]
        assert "gtvt_dc" in ev and "avg_dc" in ev and "miou" in ev and "jc" in ev
        assert "dom/CHUM/avg_dc" in ev or "dom/CHGJ/avg_dc" in ev
        # checkpoints written
        ckpts = os.listdir(str(tmp_path / "run" / "checkpoints"))
        assert any(c.endswith(".msgpack") for c in ckpts)
        # manager.state is the LIVE post-training state, not the donated
        # (deleted-buffer) one handed to the trainer — post-train consumers
        # (TTA evaluation, export) must be able to run a forward from it
        x = np.zeros((1, 16, 16, 16, 2), np.float32)
        logits = mgr.state.apply_fn({"params": mgr.state.params}, x, train=False)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_loss_decreases_overfit(self, hecktor_manifest, tmp_path):
        cfg = small_cfg(
            hecktor_manifest,
            tmp_path,
            extra=[
                "training.epochs=6",
                "training.optimizers.adam.lr=3e-3",
                "training.eval_test.do_val=false",
                "training.eval_test.do_test=false",
            ],
        )
        mgr = ExperimentManager(cfg)
        mgr.setup_model()
        mgr.setup_data("train")
        mgr.setup_optimizer()
        mgr.setup_scheduler()
        mgr.setup_trainer(str(tmp_path / "run2"))
        results = mgr.train(6)
        losses = [h["loss"] for h in results["train_history"]]
        assert losses[-1] < losses[0]

    def test_resume_from_checkpoint(self, hecktor_manifest, tmp_path):
        cfg = small_cfg(hecktor_manifest, tmp_path, extra=["training.eval_test.do_test=false"])
        mgr = ExperimentManager(cfg)
        mgr.setup_model()
        mgr.setup_data("train")
        mgr.setup_optimizer()
        mgr.setup_scheduler()
        run_dir = str(tmp_path / "run3")
        mgr.setup_trainer(run_dir)
        mgr.train(2)

        ckpt = os.path.join(run_dir, "checkpoints", "checkpoint_epoch_1")
        cfg2 = small_cfg(
            hecktor_manifest, tmp_path, extra=[f"training.resume={ckpt}", "training.eval_test.do_test=false"]
        )
        mgr2 = ExperimentManager(cfg2)
        mgr2.setup_model()
        mgr2.setup_data("train")
        mgr2.setup_optimizer()
        mgr2.setup_scheduler()
        mgr2.setup_trainer(str(tmp_path / "run4"))
        assert mgr2.trainer.start_epoch == 2
        # params actually restored (not fresh init)
        p_trained = jax.tree_util.tree_leaves(mgr.trainer.state.params)
        p_resumed = jax.tree_util.tree_leaves(mgr2.trainer.state.params)
        assert any(
            np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p_trained, p_resumed)
        )

    def test_mesh_uses_all_cpu_devices(self, hecktor_manifest, tmp_path):
        cfg = small_cfg(hecktor_manifest, tmp_path)
        mgr = ExperimentManager(cfg)
        assert mgr.mesh.devices.size == 8  # conftest forces 8 CPU devices


class TestOnDeviceTransforms:
    def test_on_device_normalization_consistent_train_eval(self, hecktor_manifest, tmp_path):
        """With transforms.on_device=true the datasets emit RAW intensities;
        both the train step AND the eval forward must normalize on device.
        Eval metrics computed either way must match (same weights)."""
        import jax

        cfg_host = small_cfg(hecktor_manifest, tmp_path, extra=["training.eval_test.do_test=false"])
        cfg_dev = small_cfg(
            hecktor_manifest,
            tmp_path,
            extra=[
                "training.eval_test.do_test=false",
                "training.data.transforms.on_device=true",
            ],
        )

        mgr_h = ExperimentManager(cfg_host)
        mgr_h.setup_model()
        mgr_h.setup_data("train")
        mgr_h.setup_optimizer()

        mgr_d = ExperimentManager(cfg_dev)
        mgr_d.setup_model()
        mgr_d.setup_data("train")
        mgr_d.setup_optimizer()

        # identical weights (same seed), different normalization placement
        from multimodal_tta_tpu.registry import get_evaluation_strategy

        strat_h = get_evaluation_strategy("seg_eval")(cfg_host)
        strat_d = get_evaluation_strategy("seg_eval")(cfg_dev)
        with mgr_h.mesh:
            m_h = strat_h.evaluate_epoch(mgr_h.state, mgr_h.test_loader, mgr_h.mesh)
        with mgr_d.mesh:
            m_d = strat_d.evaluate_epoch(mgr_d.state, mgr_d.test_loader, mgr_d.mesh)
        assert m_h["gtvt_dc"] == pytest.approx(m_d["gtvt_dc"], abs=2e-3)
        assert m_h["avg_dc"] == pytest.approx(m_d["avg_dc"], abs=2e-3)


class TestSpatialShardingConfig:
    def test_train_with_space_axis(self, hecktor_manifest, tmp_path):
        """training.mesh.space=2 shards volume depth over the space axis;
        training must run and losses stay finite (XLA inserts conv halo
        exchanges)."""
        cfg = small_cfg(
            hecktor_manifest,
            tmp_path,
            extra=[
                "training.mesh.data=4",
                "training.mesh.space=2",
                "training.epochs=1",
                "training.batch_size=4",
                "training.eval_test.do_val=false",
                "training.eval_test.do_test=false",
            ],
        )
        mgr = ExperimentManager(cfg)
        assert mgr.mesh.shape["space"] == 2 and mgr.mesh.shape["data"] == 4
        mgr.setup_model()
        mgr.setup_data("train")
        mgr.setup_optimizer()
        mgr.setup_scheduler()
        mgr.setup_trainer(str(tmp_path / "run_sp"))
        results = mgr.train(1)
        assert np.isfinite(results["train_history"][0]["loss"])


class TestDeepSupervisionTraining:
    def test_train_with_ds_moves_aux_heads(self, hecktor_manifest, tmp_path):
        """model.deep_supervision=2: training runs with the multi-scale loss
        and the aux heads receive gradients (their params move)."""
        cfg = small_cfg(
            hecktor_manifest,
            tmp_path,
            extra=[
                "model.deep_supervision=2",
                "training.epochs=1",
                "training.eval_test.do_val=false",
                "training.eval_test.do_test=false",
            ],
        )
        mgr = ExperimentManager(cfg)
        mgr.setup_model()
        mgr.setup_data("train")
        mgr.setup_optimizer()
        mgr.setup_scheduler()
        mgr.setup_trainer(str(tmp_path / "run_ds"))
        before = jax.tree_util.tree_map(np.asarray, mgr.state.params["ds_head1"])
        results = mgr.train(1)
        assert np.isfinite(results["train_history"][0]["loss"])
        after = mgr.state.params["ds_head1"]
        moved = sum(
            float(jnp.sum(jnp.abs(jnp.asarray(a) - b)))
            for a, b in zip(jax.tree_util.tree_leaves(after), jax.tree_util.tree_leaves(before))
        )
        assert moved > 0.0


class TestDeterminism:
    def test_identical_runs_identical_losses(self, hecktor_manifest, tmp_path):
        def run(tag):
            cfg = small_cfg(
                hecktor_manifest,
                tmp_path,
                extra=[
                    "training.epochs=2",
                    "training.eval_test.do_val=false",
                    "training.eval_test.do_test=false",
                    f"task.run_name=det_{tag}",
                ],
            )
            mgr = ExperimentManager(cfg)
            mgr.setup_model()
            mgr.setup_data("train")
            mgr.setup_optimizer()
            mgr.setup_scheduler()
            mgr.setup_trainer(str(tmp_path / f"det_{tag}"))
            return [h["loss"] for h in mgr.train(2)["train_history"]]

        a = run("a")
        b = run("b")
        assert a == b, f"non-deterministic training: {a} vs {b}"


class TestDeepSupervisionValidation:
    def test_non_ds_model_raises_clearly(self, hecktor_manifest, tmp_path):
        """model.deep_supervision with a model that sows no aux heads fails
        at trace time with an actionable message, not a KeyError."""
        cfg = small_cfg(
            hecktor_manifest,
            tmp_path,
            extra=[
                "model=unet_multimodal_midfusion",
                "model.num_modalities=2",
                "model.num_classes=1",
                "model.channels=[4,8,16,32,64]",
                "model.deep_supervision=2",
                "training.epochs=1",
                "training.eval_test.do_val=false",
                "training.eval_test.do_test=false",
            ],
        )
        mgr = ExperimentManager(cfg)
        mgr.setup_model()
        mgr.setup_data("train")
        mgr.setup_optimizer()
        mgr.setup_scheduler()
        mgr.setup_trainer(str(tmp_path / "run_ds_bad"))
        with pytest.raises(ValueError, match="does not implement deep supervision"):
            mgr.train(1)
