"""Knowledge distillation (training.distill / core/distill.py):
kd_loss semantics, teacher build+load, and the distilled SegTrainer step.

New capability — the reference has no student/teacher machinery (its
closest surface is the vestigial UE surrogate config,
reference src/core/experiment_manager.py:98-109)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.checkpoint import save_checkpoint
from multimodal_tta_tpu.core.distill import DistillConfig, kd_loss
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.core.trainers.seg_trainer import SegTrainer
from multimodal_tta_tpu.models import UNet3D

TEACHER_ARCH = {
    "name": "unet",
    "in_channels": 1,
    "num_classes": 1,
    "channels": [2, 4, 8],
    "strides": [2, 2],
    "num_res_units": 1,
}


def make_state(channels=(2, 4, 8), seed=0, lr=0.05):
    m = UNet3D(in_channels=1, num_classes=1, channels=channels,
               strides=(2, 2), num_res_units=1)
    x = jnp.zeros((2, 8, 8, 8, 1))
    variables = m.init(jax.random.PRNGKey(seed), x, train=True)
    return TrainState.create(
        apply_fn=m.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=optax.sgd(lr),
    )


def teacher_checkpoint(tmp_path, seed=3):
    state = make_state(seed=seed)
    path = str(tmp_path / "teacher_ckpt")
    save_checkpoint(path, state)
    return path, state


def make_trainer(distill: dict | None):
    node = {
        "training": {
            "criterion": {"sigmoid": True, "lambda_dice": 1.0, "lambda_bce": 1.0},
            "compute_dtype": "float32",
            "data": {"transforms": {"image_size": [8, 8, 8]}},
        },
        "task": {"seed": 0},
    }
    if distill is not None:
        node["training"]["distill"] = distill
    cfg = ConfigNode(node)
    trainer = SegTrainer(cfg, mesh=None)
    trainer.state = make_state(seed=0)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(2, 8, 8, 8, 1).astype(np.float32),
        "label": (rng.rand(2, 8, 8, 8, 1) > 0.5).astype(np.float32),
    }
    return trainer, batch


class TestKdLoss:
    def test_zero_when_student_matches_teacher(self):
        lg = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 4, 1), jnp.float32)
        per = kd_loss(lg, lg, sigmoid=True, temperature=2.0)
        assert per.shape == (2,)
        np.testing.assert_allclose(np.asarray(per), 0.0, atol=1e-6)

    def test_gradient_pulls_toward_teacher(self):
        t = jnp.full((1, 2, 2, 2, 1), 2.0)
        s = jnp.zeros((1, 2, 2, 2, 1))

        def f(sl):
            return jnp.sum(kd_loss(sl, t, sigmoid=True, temperature=2.0))

        g = jax.grad(f)(s)
        # descent moves student logits UP toward the teacher's +2
        assert float(jnp.max(g)) < 0

    def test_softmax_mode(self):
        t = jnp.asarray([[[3.0, 0.0, 0.0]]])
        s = jnp.asarray([[[0.0, 0.0, 3.0]]])
        per = kd_loss(s, t, sigmoid=False, temperature=1.0)
        assert float(per[0]) > 0
        np.testing.assert_allclose(
            float(kd_loss(t, t, sigmoid=False, temperature=1.0)[0]), 0.0, atol=1e-6
        )

    def test_temperature_invariant_gradient_scale(self):
        """The T^2 rescale keeps gradients the same order across T (exact
        equality only as T->inf; check within a factor of ~2 for T=1 vs 4)."""
        rng = np.random.RandomState(1)
        t = jnp.asarray(rng.randn(1, 4, 4, 4, 1), jnp.float32)
        s = jnp.asarray(rng.randn(1, 4, 4, 4, 1), jnp.float32)

        def gnorm(temp):
            g = jax.grad(lambda sl: jnp.sum(kd_loss(sl, t, sigmoid=True, temperature=temp)))(s)
            return float(jnp.linalg.norm(g.ravel()))

        g1, g4 = gnorm(1.0), gnorm(4.0)
        assert 0.3 < g1 / g4 < 3.0


class TestDistillConfig:
    def test_disabled_by_default(self):
        cfg = ConfigNode({"training": {}})
        assert not DistillConfig(cfg).enabled

    def test_requires_checkpoint_and_model(self):
        cfg = ConfigNode({"training": {"distill": {"enabled": True}}})
        with pytest.raises(Exception):
            DistillConfig(cfg)
        cfg = ConfigNode({"training": {"distill": {
            "enabled": True, "checkpoint": "/tmp/x"}}})
        with pytest.raises(Exception):
            DistillConfig(cfg)

    def test_rejects_nonpositive_weight(self):
        cfg = ConfigNode({"training": {"distill": {
            "enabled": True, "checkpoint": "/tmp/x", "weight": 0.0,
            "model": TEACHER_ARCH}}})
        with pytest.raises(ValueError, match="weight"):
            DistillConfig(cfg)


class TestDistilledStep:
    def test_step_runs_and_losses_decrease(self, tmp_path):
        ckpt, _ = teacher_checkpoint(tmp_path)
        trainer, batch = make_trainer({
            "enabled": True, "checkpoint": ckpt, "temperature": 2.0,
            "weight": 1.0, "model": TEACHER_ARCH,
        })
        losses = []
        for _ in range(8):
            trainer.run_step(batch)
            losses.append(trainer.flush_step_metrics()["loss"])
        assert losses[-1] < losses[0], f"distilled loss did not decrease: {losses}"

    def test_kd_changes_the_trajectory(self, tmp_path):
        """Same data, same init: the distilled run must diverge from the
        plain run (the teacher term is actually in the objective)."""
        ckpt, _ = teacher_checkpoint(tmp_path)
        plain, batch = make_trainer(None)
        dist, _ = make_trainer({
            "enabled": True, "checkpoint": ckpt, "temperature": 2.0,
            "weight": 5.0, "model": TEACHER_ARCH,
        })
        for _ in range(3):
            plain.run_step(batch)
            dist.run_step(batch)
        diffs = [
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(plain.state.params),
                jax.tree_util.tree_leaves(dist.state.params),
            )
        ]
        assert max(diffs) > 1e-6, "KD term had no effect on the update"

    def test_teacher_vars_frozen(self, tmp_path):
        ckpt, teacher_state = teacher_checkpoint(tmp_path)
        trainer, batch = make_trainer({
            "enabled": True, "checkpoint": ckpt, "temperature": 2.0,
            "weight": 1.0, "model": TEACHER_ARCH,
        })
        for _ in range(3):
            trainer.run_step(batch)
        for a, b in zip(
            jax.tree_util.tree_leaves(trainer._teacher_vars["params"]),
            jax.tree_util.tree_leaves(teacher_state.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_mesh_parity(self, tmp_path):
        """Distilled step on the 8-device data mesh matches single-device
        numerics (teacher replicated, batch sharded)."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        ckpt, _ = teacher_checkpoint(tmp_path)
        spec = {
            "enabled": True, "checkpoint": ckpt, "temperature": 2.0,
            "weight": 1.0, "model": TEACHER_ARCH,
        }
        t_single, batch = make_trainer(spec)
        t_mesh, _ = make_trainer(spec)
        t_mesh.mesh = make_mesh()
        batch8 = {
            "image": np.tile(batch["image"], (4, 1, 1, 1, 1)),
            "label": np.tile(batch["label"], (4, 1, 1, 1, 1)),
        }
        for _ in range(2):
            t_single.run_step(batch8)
            t_mesh.run_step(batch8)
        for a, b in zip(
            jax.tree_util.tree_leaves(t_single.state.params),
            jax.tree_util.tree_leaves(t_mesh.state.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


class TestKdFocus:
    def test_uncertain_zero_at_equality(self):
        lg = jnp.asarray(np.random.RandomState(2).randn(2, 4, 4, 4, 1), jnp.float32)
        per = kd_loss(lg, lg, sigmoid=True, temperature=2.0, focus="uncertain")
        np.testing.assert_allclose(np.asarray(per), 0.0, atol=1e-6)

    def test_uncertain_upweights_boundary_voxels(self):
        """Mismatch at a teacher-uncertain voxel must cost (much) more under
        focus=uncertain than the same mismatch at a teacher-confident voxel —
        the anti-dilution property."""
        t = np.full((1, 4, 4, 4, 1), 8.0, np.float32)  # confident everywhere
        t[0, 0, 0, 0, 0] = 0.1                          # one uncertain voxel
        s_at_uncertain = t.copy(); s_at_uncertain[0, 0, 0, 0, 0] += 2.0
        s_at_confident = t.copy(); s_at_confident[0, 1, 1, 1, 0] += 2.0
        t, s_u, s_c = map(jnp.asarray, (t, s_at_uncertain, s_at_confident))
        l_u = float(kd_loss(s_u, t, sigmoid=True, focus="uncertain")[0])
        l_c = float(kd_loss(s_c, t, sigmoid=True, focus="uncertain")[0])
        assert l_u > 10 * l_c, (l_u, l_c)

    def test_bad_focus_rejected(self):
        lg = jnp.zeros((1, 2, 2, 2, 1))
        with pytest.raises(ValueError, match="focus"):
            kd_loss(lg, lg, focus="bogus")
        cfg = ConfigNode({"training": {"distill": {
            "enabled": True, "checkpoint": "/tmp/x", "focus": "bogus",
            "model": TEACHER_ARCH}}})
        with pytest.raises(ValueError, match="focus"):
            DistillConfig(cfg)

    def test_focused_step_runs(self, tmp_path):
        ckpt, _ = teacher_checkpoint(tmp_path)
        trainer, batch = make_trainer({
            "enabled": True, "checkpoint": ckpt, "temperature": 2.0,
            "weight": 1.0, "focus": "uncertain", "model": TEACHER_ARCH,
        })
        losses = []
        for _ in range(5):
            trainer.run_step(batch)
            losses.append(trainer.flush_step_metrics()["loss"])
        assert losses[-1] < losses[0]
