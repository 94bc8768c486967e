"""2D classifier-backbone family tests (registry parity layer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.registry import get_model, list_models


EXPECTED_NAMES = [
    "unet",
    "unet_multimodal_midfusion",
    "unet_multimodal_deepfusion",
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "densenet121", "densenet169", "densenet201", "densenet161",
    "vit_b_16", "vit_b_32", "vit_l_16", "vit_l_32", "vit_h_14",
    "efficientnet_b0", "efficientnet_b1", "efficientnet_b2", "efficientnet_b3",
    "efficientnet_b4", "efficientnet_b5", "efficientnet_b6", "efficientnet_b7",
    "efficientnet_v2_s", "efficientnet_v2_m", "efficientnet_v2_l",
]


def test_registry_names_complete():
    """Every model name the reference registers must resolve here
    (reference: src/models/__init__.py:33-60)."""
    import multimodal_tta_tpu.models  # noqa: F401

    registered = set(list_models())
    missing = [n for n in EXPECTED_NAMES if n not in registered]
    assert not missing, f"missing registry names: {missing}"


class TestResNet:
    def test_forward(self, rng_key):
        m = get_model("resnet18").from_config(ConfigNode({"num_classes": 10}))
        x = jnp.zeros((2, 64, 64, 3))
        v = m.init(rng_key, x, train=True)
        feats, logits = m.apply(v, x, train=False)
        assert feats.shape == (2, 512)
        assert logits.shape == (2, 10)

    def test_bottleneck_variant(self, rng_key):
        m = get_model("resnet50").from_config(ConfigNode({"num_classes": 4}))
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(rng_key, x, train=True)
        feats, logits = m.apply(v, x, train=False)
        assert feats.shape == (1, 2048)
        assert logits.shape == (1, 4)

    def test_reid_mode_l2_normalized(self, rng_key):
        m = get_model("resnet18").from_config(
            ConfigNode({"num_classes": 5, "reid_mode": True, "embedding_dim": 64})
        )
        x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
        v = m.init(rng_key, x, train=True)
        emb, logits = m.apply(v, x, train=False)
        assert emb.shape == (2, 64)
        assert np.allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-4)


class TestDenseNet:
    def test_forward(self, rng_key):
        m = get_model("densenet121").from_config(ConfigNode({"num_classes": 7}))
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(rng_key, x, train=True)
        feats, logits = m.apply(v, x, train=False)
        assert feats.shape == (1, 1024)  # 121's final feature width
        assert logits.shape == (1, 7)


class TestViT:
    def test_forward(self, rng_key):
        m = get_model("vit_b_16").from_config(ConfigNode({"num_classes": 3, "image_size": 32}))
        x = jnp.zeros((2, 32, 32, 3))
        v = m.init(rng_key, x, train=True)
        feats, logits = m.apply(v, x, train=False)
        assert feats.shape == (2, 768)
        assert logits.shape == (2, 3)

    def test_bad_patch_divisibility(self, rng_key):
        m = get_model("vit_b_16").from_config(ConfigNode({"num_classes": 3}))
        with pytest.raises(ValueError, match="not divisible"):
            m.init(rng_key, jnp.zeros((1, 30, 30, 3)))


class TestEfficientNet:
    def test_b0_forward(self, rng_key):
        m = get_model("efficientnet_b0").from_config(ConfigNode({"num_classes": 2}))
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(rng_key, x, train=True)
        feats, logits = m.apply(v, x, train=False)
        assert feats.shape == (1, 1280)
        assert logits.shape == (1, 2)

    def test_v2_s_forward(self, rng_key):
        m = get_model("efficientnet_v2_s").from_config(ConfigNode({"num_classes": 2}))
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(rng_key, x, train=True)
        feats, logits = m.apply(v, x, train=False)
        assert logits.shape == (1, 2)
