"""Tensor parallelism over the mesh ``model`` axis (Megatron-style).

The transformer family (models/vit.py SelfAttention / EncoderBlock, reused by
models/unetr.py) shards attention heads and the MLP hidden dimension over a
third mesh axis (`parallel/mesh.py` MODEL_AXIS, `training.mesh.model`). The
reference has no tensor parallelism at all (its only multi-device path is
torch DataParallel, reference src/core/experiment_manager.py:95-96); this is
a beyond-reference scaling capability, validated here on the CPU-simulated
8-device mesh: numerics must match the unsharded model, the compile must
contain cross-device collectives (so a silently-degraded constraint can't
pass), and the SPMD partitioner must not fall back to involuntary
rematerialization.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.models.vit import ViT
from multimodal_tta_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SPACE_AXIS, make_mesh

INVOLUNTARY = "Involuntary full rematerialization"

TINY_VIT = dict(
    variant="vit_b_16",
    num_classes=5,
    image_size=8,
    patch=4,
    hidden=32,
    depth=2,
    heads=4,
    mlp_dim=64,
)

TINY_UNETR = dict(
    patch_size=4,
    hidden_size=32,
    mlp_dim=64,
    num_heads=4,
    num_layers=4,
    feature_size=4,
)


@pytest.fixture
def no_compile_cache():
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", True)


class TestMeshModelAxis:
    def test_three_axis_mesh(self):
        mesh = make_mesh(data=2, space=2, model=2)
        assert mesh.axis_names == (DATA_AXIS, SPACE_AXIS, MODEL_AXIS)
        assert dict(mesh.shape) == {DATA_AXIS: 2, SPACE_AXIS: 2, MODEL_AXIS: 2}

    def test_default_stays_two_axis(self):
        mesh = make_mesh()
        assert mesh.axis_names == (DATA_AXIS, SPACE_AXIS)

    def test_data_inferred_with_model(self):
        mesh = make_mesh(model=4)
        assert dict(mesh.shape) == {DATA_AXIS: 2, SPACE_AXIS: 1, MODEL_AXIS: 4}

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            make_mesh(data=2, space=2, model=3)


class TestViTTensorParallel:
    def _init(self):
        model = ViT(**TINY_VIT)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        return model, variables, x

    def test_param_tree_unchanged_by_tp(self):
        """tp_axis is a layout hint only: the param tree (and therefore
        checkpoints and ported torchvision weights) is identical with and
        without it."""
        model, variables, x = self._init()
        tp = ViT(**TINY_VIT, tp_axis=MODEL_AXIS)
        v_tp = tp.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v_tp)
        for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(v_tp)):
            assert a.shape == b.shape

    def test_tp_forward_matches_unsharded(self):
        model, variables, x = self._init()
        feats_ref, logits_ref = jax.jit(model.apply)(variables, x)

        tp = ViT(**TINY_VIT, tp_axis=MODEL_AXIS)
        mesh = make_mesh(data=2, space=1, model=4)
        with mesh:
            feats, logits = jax.jit(tp.apply)(variables, x)
            feats, logits = jax.device_get((feats, logits))
        np.testing.assert_allclose(feats, np.asarray(feats_ref), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(logits, np.asarray(logits_ref), rtol=2e-5, atol=2e-5)

    def test_tp_compile_sharded_and_clean(self, capfd, no_compile_cache):
        """The compiled module actually runs collectives over the model axis
        (not a silently-replicated fallback) and the partitioner emits no
        involuntary-rematerialization warnings."""
        _, variables, x = self._init()
        tp = ViT(**TINY_VIT, tp_axis=MODEL_AXIS)
        mesh = make_mesh(data=1, space=1, model=8)
        with mesh:
            capfd.readouterr()
            compiled = jax.jit(tp.apply).lower(variables, x).compile()
        captured = capfd.readouterr()
        assert INVOLUNTARY not in captured.err, captured.err[-4000:]
        txt = compiled.as_text()
        assert "all-reduce" in txt or "all-gather" in txt or "collective" in txt


class TestUNETRTensorParallel:
    def _init(self, **kw):
        from multimodal_tta_tpu.models.unetr import UNETR

        model = UNETR(in_channels=2, num_classes=2, **TINY_UNETR, **kw)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8, 2))
        variables = model.init(jax.random.PRNGKey(0), x)
        return model, variables, x

    def test_tp_forward_matches_unsharded(self):
        model, variables, x = self._init()
        ref = jax.jit(model.apply)(variables, x)

        tp_model, _, _ = self._init(tp_axis=MODEL_AXIS)
        mesh = make_mesh(data=2, space=1, model=4)
        with mesh:
            out = jax.device_get(jax.jit(tp_model.apply)(variables, x))
        np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_tent_adapt_on_data_model_mesh(self):
        """The TTA engine runs unchanged over a data×model mesh: adapted
        params match the no-mesh adaptation (tensor parallelism composes
        with the norm-affine adapt step)."""
        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.core.optim import build_optimizer
        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.tta import TentAdapter

        cfg = ConfigNode(
            {
                "task": {"seed": 0},
                "training": {
                    "optimizer": "adam",
                    "optimizers": {"adam": {"lr": 1e-3}},
                    "criterion": {"sigmoid": True},
                },
                "tta": {
                    "method": "tent",
                    "steps": 1,
                    "lr": 1e-3,
                    "optimizer": "sgd",
                    "momentum": 0.9,
                    "update": "norm",
                    "episodic": True,
                },
            }
        )
        tp_model, variables, _ = self._init(tp_axis=MODEL_AXIS)
        tx, _ = build_optimizer(cfg.training, variables["params"])
        state = TrainState.create(
            apply_fn=tp_model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=tx,
        )
        rng = np.random.RandomState(2)
        img = rng.randn(4, 8, 8, 8, 2).astype(np.float32)

        mesh = make_mesh(data=2, space=1, model=4)
        with mesh:
            adapter = TentAdapter(cfg.tta, config=cfg, mesh=mesh)
            adapted_mesh = adapter.make_adapt_fn(state)(state, jnp.asarray(img), 4)
            ent_mesh = adapter.last_entropy

        ref_model, _, _ = self._init()
        state1 = state.replace(apply_fn=ref_model.apply)
        adapter1 = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapted_1 = adapter1.make_adapt_fn(state1)(state1, jnp.asarray(img), 4)
        ent_1 = adapter1.last_entropy

        assert np.isfinite(ent_mesh) and np.isfinite(ent_1)
        assert abs(ent_mesh - ent_1) < 1e-4
        for a, b in zip(
            jax.tree_util.tree_leaves(adapted_mesh.params),
            jax.tree_util.tree_leaves(adapted_1.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
