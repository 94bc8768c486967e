"""Train-time weight EMA (training.ema): in-step shadow update,
eval-on-EMA swap, checkpoint round-trip incl. toggled-resume handling,
and the serving-side resolve_serving_params swap."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.checkpoint import (
    load_checkpoint,
    resolve_serving_params,
    save_checkpoint,
)
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.core.trainers.seg_trainer import SegTrainer
from multimodal_tta_tpu.models import UNet3D


def make_trainer(ema: dict | None):
    node = {
        "training": {
            "criterion": {"sigmoid": True, "lambda_dice": 1.0, "lambda_bce": 1.0},
        },
        "task": {"seed": 0},
    }
    if ema is not None:
        node["training"]["ema"] = ema
    cfg = ConfigNode(node)
    trainer = SegTrainer(cfg, mesh=None)
    m = UNet3D(in_channels=1, num_classes=1, channels=(2, 4, 8),
               strides=(2, 2), num_res_units=1)
    x = jnp.zeros((2, 8, 8, 8, 1))
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    trainer.state = TrainState.create(
        apply_fn=m.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=optax.sgd(0.05),
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(2, 8, 8, 8, 1).astype(np.float32),
        "label": (rng.rand(2, 8, 8, 8, 1) > 0.5).astype(np.float32),
    }
    return trainer, batch


def leaves(tree):
    return jax.tree_util.tree_leaves(tree)


class TestEmaStep:
    def test_shadow_follows_recursion(self):
        """After k steps the shadow equals the exact recursion over the
        per-step params."""
        decay = 0.9
        trainer, batch = make_trainer({"enabled": True, "decay": decay})
        ema_manual = None
        for step in range(3):
            p_before = jax.device_get(trainer.state.params)
            if ema_manual is None:
                ema_manual = p_before  # shadow initializes at params0
            trainer.run_step(batch)
            p_after = jax.device_get(trainer.state.params)
            ema_manual = jax.tree_util.tree_map(
                lambda e, p: e * decay + (1 - decay) * p, ema_manual, p_after
            )
        got = jax.device_get(trainer.state.ema_params)
        for a, b in zip(leaves(got), leaves(ema_manual)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        # and the shadow genuinely differs from the live params
        diffs = [
            float(np.abs(a - b).max())
            for a, b in zip(leaves(got), leaves(jax.device_get(trainer.state.params)))
        ]
        assert max(diffs) > 0

    def test_disabled_leaves_state_unchanged(self):
        trainer, batch = make_trainer(None)
        trainer.run_step(batch)
        trainer.flush_step_metrics()
        assert trainer.state.ema_params is None
        assert trainer.eval_state() is trainer.state

    def test_eval_state_swaps_ema(self):
        trainer, batch = make_trainer({"enabled": True, "decay": 0.5})
        for _ in range(2):
            trainer.run_step(batch)
        ev = trainer.eval_state()
        for a, b in zip(leaves(ev.params), leaves(trainer.state.ema_params)):
            assert a is b
        # eval=false keeps the live params
        trainer2, batch = make_trainer({"enabled": True, "decay": 0.5, "eval": False})
        trainer2.run_step(batch)
        assert trainer2.eval_state() is trainer2.state

    def test_bad_decay_raises(self):
        with pytest.raises(ValueError, match="decay"):
            make_trainer({"enabled": True, "decay": 1.5})


class TestEmaMesh:
    def test_mesh_shadow_matches_single_device(self):
        """Data-parallel 8-device mesh: the replicated shadow must follow
        the same recursion as the mesh=None run (same seed, same batch)."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # all devices on the data axis
        t_mesh, batch = make_trainer({"enabled": True, "decay": 0.9})
        t_none, _ = make_trainer({"enabled": True, "decay": 0.9})
        t_mesh.mesh = mesh
        with mesh:
            for _ in range(2):
                t_mesh.run_step(batch)
        for _ in range(2):
            t_none.run_step(batch)
        for a, b in zip(
            leaves(jax.device_get(t_mesh.state.ema_params)),
            leaves(jax.device_get(t_none.state.ema_params)),
        ):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


class TestEmaCheckpoint:
    def test_roundtrip_preserves_shadow(self, tmp_path):
        trainer, batch = make_trainer({"enabled": True, "decay": 0.9})
        for _ in range(2):
            trainer.run_step(batch)
        path = os.path.join(tmp_path, "ck")
        save_checkpoint(path, trainer.state)

        template = trainer.state.replace(ema_params=trainer.state.params)
        restored, _ = load_checkpoint(path, template)
        for a, b in zip(leaves(restored.ema_params), leaves(trainer.state.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_without_ema_from_ema_checkpoint(self, tmp_path):
        """training.ema toggled OFF on resume: restore must still work."""
        trainer, batch = make_trainer({"enabled": True, "decay": 0.9})
        trainer.run_step(batch)
        path = os.path.join(tmp_path, "ck")
        save_checkpoint(path, trainer.state)

        plain, _ = make_trainer(None)
        restored, _ = load_checkpoint(path, plain.state)
        for a, b in zip(leaves(restored.params), leaves(trainer.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the shadow from the blob is carried (params-shaped tree)
        assert restored.ema_params is not None

    def test_resume_with_ema_from_plain_checkpoint_warm_starts(self, tmp_path):
        plain, batch = make_trainer(None)
        plain.run_step(batch)
        path = os.path.join(tmp_path, "ck")
        save_checkpoint(path, plain.state)

        emat, _ = make_trainer({"enabled": True})
        template = emat.state.replace(ema_params=emat.state.params)
        restored, _ = load_checkpoint(path, template)
        # warm start: shadow == restored params
        for a, b in zip(leaves(restored.ema_params), leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestServingSwap:
    def test_resolve_serving_params(self):
        trainer, batch = make_trainer({"enabled": True, "decay": 0.5})
        trainer.run_step(batch)
        st = trainer.state
        swapped = resolve_serving_params(st, True)
        for a, b in zip(leaves(swapped.params), leaves(st.ema_params)):
            assert a is b
        assert resolve_serving_params(st, False) is st

    def test_resolve_without_shadow_raises(self):
        trainer, _ = make_trainer(None)
        with pytest.raises(ValueError, match="use_ema_params"):
            resolve_serving_params(trainer.state, True)
