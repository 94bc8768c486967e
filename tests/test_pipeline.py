"""Pipeline parallelism over the mesh ``stage`` axis (parallel/pipeline.py).

GPipe-style microbatch schedule under shard_map + ppermute, validated on the
CPU-simulated 8-device mesh: numerics must match the sequential layer stack,
the compiled module must contain the inter-stage collective-permute (so a
silently-sequential compile can't pass), and the schedule must compose with
data parallelism (dp × pp meshes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.models.vit import ViT
from multimodal_tta_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SPACE_AXIS,
    STAGE_AXIS,
    make_mesh,
)
from multimodal_tta_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_layer_params,
    vit_forward_pipelined,
)


class TestMeshStageAxis:
    def test_stage_axis_last(self):
        mesh = make_mesh(data=2, stage=4)
        assert mesh.axis_names == (DATA_AXIS, SPACE_AXIS, STAGE_AXIS)
        assert dict(mesh.shape) == {DATA_AXIS: 2, SPACE_AXIS: 1, STAGE_AXIS: 4}

    def test_all_four_axes(self):
        mesh = make_mesh(data=1, space=2, model=2, stage=2)
        assert mesh.axis_names == (DATA_AXIS, SPACE_AXIS, MODEL_AXIS, STAGE_AXIS)

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            make_mesh(stage=3)


def _linear_layers(n_layers, dim, key):
    """Per-layer dicts for a toy residual-MLP layer stack."""
    ks = jax.random.split(key, n_layers)
    return {
        f"layer{i}": {
            "w": jax.random.normal(ks[i], (dim, dim)) * 0.1,
            "b": jnp.zeros((dim,)),
        }
        for i in range(n_layers)
    }


def _layer_fn(p, x):
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _sequential(params, n_layers, x):
    for i in range(n_layers):
        x = _layer_fn(params[f"layer{i}"], x)
    return x


class TestStackLayerParams:
    def test_stacks_in_order(self):
        params = _linear_layers(3, 4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, "layer", 3)
        assert stacked["w"].shape == (3, 4, 4)
        np.testing.assert_array_equal(
            np.asarray(stacked["w"][1]), np.asarray(params["layer1"]["w"])
        )

    def test_missing_layer_raises(self):
        params = _linear_layers(3, 4, jax.random.PRNGKey(0))
        with pytest.raises(KeyError, match="layer3"):
            stack_layer_params(params, "layer", 4)


class TestPipelineApply:
    @pytest.mark.parametrize(
        "data,stage,n_micro",
        [(1, 8, 8), (2, 4, 4), (4, 2, 2), (2, 4, 2)],
    )
    def test_matches_sequential(self, data, stage, n_micro):
        n_layers, dim, batch = 8, 16, 8
        params = _linear_layers(n_layers, dim, jax.random.PRNGKey(1))
        x = jax.random.normal(jax.random.PRNGKey(2), (batch, 6, dim))
        ref = _sequential(params, n_layers, x)
        mesh = make_mesh(data=data, stage=stage)
        stacked = stack_layer_params(params, "layer", n_layers)
        with mesh:
            out = jax.jit(
                lambda p, x: pipeline_apply(mesh, _layer_fn, p, x, n_micro=n_micro)
            )(stacked, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
        )

    def test_compile_contains_collective_permute(self):
        """Guard against vacuity: the compiled program really pipelines
        (inter-stage ppermute present)."""
        n_layers, dim = 4, 8
        params = _linear_layers(n_layers, dim, jax.random.PRNGKey(1))
        stacked = stack_layer_params(params, "layer", n_layers)
        x = jnp.zeros((8, 3, dim))
        mesh = make_mesh(data=2, stage=4)
        with mesh:
            compiled = (
                jax.jit(lambda p, x: pipeline_apply(mesh, _layer_fn, p, x, n_micro=4))
                .lower(stacked, x)
                .compile()
            )
        txt = compiled.as_text()
        assert "collective-permute" in txt or "ppermute" in txt

    def test_requires_stage_axis(self):
        params = _linear_layers(2, 4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, "layer", 2)
        mesh = make_mesh()  # no stage axis
        with pytest.raises(ValueError, match="stage axis"):
            pipeline_apply(mesh, _layer_fn, stacked, jnp.zeros((4, 4)), n_micro=2)

    def test_layers_must_divide_stages(self):
        params = _linear_layers(6, 4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, "layer", 6)
        mesh = make_mesh(data=2, stage=4)
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_apply(mesh, _layer_fn, stacked, jnp.zeros((4, 4)), n_micro=2)

    def test_batch_must_divide_micro(self):
        params = _linear_layers(4, 4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, "layer", 4)
        mesh = make_mesh(data=2, stage=4)
        with pytest.raises(ValueError, match="n_micro"):
            pipeline_apply(mesh, _layer_fn, stacked, jnp.zeros((6, 4)), n_micro=4)


class TestViTPipelined:
    def test_matches_sequential_forward(self):
        m = ViT(variant="vit_b_16", num_classes=5, image_size=8,
                patch=4, hidden=32, depth=4, heads=4, mlp_dim=64)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        ref_cls, ref_logits = m.apply(v, x)
        mesh = make_mesh(data=2, stage=4)
        with mesh:
            cls, logits = jax.jit(
                lambda v, x: vit_forward_pipelined(m, v, x, mesh, n_micro=4)
            )(v, x)
        np.testing.assert_allclose(
            np.asarray(cls), np.asarray(ref_cls), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), rtol=2e-5, atol=2e-5
        )

    def test_pure_pipeline_no_data_axis(self):
        m = ViT(variant="vit_b_16", num_classes=3, image_size=8,
                patch=4, hidden=32, depth=8, heads=4, mlp_dim=64)
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        _, ref_logits = m.apply(v, x)
        mesh = make_mesh(data=1, stage=8)
        with mesh:
            _, logits = jax.jit(
                lambda v, x: vit_forward_pipelined(m, v, x, mesh, n_micro=4)
            )(v, x)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), rtol=2e-5, atol=2e-5
        )
