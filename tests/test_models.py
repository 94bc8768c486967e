import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.models import UNet3D, MultimodalUNetMidFusion
from multimodal_tta_tpu.registry import get_model

SMALL = dict(channels=(4, 8, 16, 32, 64), strides=(2, 2, 2, 2))


class TestUNet3D:
    def test_registered(self):
        assert get_model("unet") is UNet3D

    def test_from_config(self):
        cfg = ConfigNode(
            {
                "in_channels": 2,
                "num_classes": 1,
                "channels": [4, 8, 16, 32, 64],
                "strides": [2, 2, 2, 2],
                "num_res_units": 2,
                "norm": "INSTANCE",
                "act": "RELU",
            }
        )
        m = UNet3D.from_config(cfg)
        assert m.in_channels == 2 and m.channels == (4, 8, 16, 32, 64)

    def test_forward_shape(self, rng_key):
        m = UNet3D(in_channels=2, num_classes=1, **SMALL)
        x = jnp.zeros((1, 16, 16, 16, 2))
        vars_ = m.init(rng_key, x)
        y = m.apply(vars_, x)
        assert y.shape == (1, 16, 16, 16, 1)
        assert y.dtype == jnp.float32

    def test_forward_brats_shape(self, rng_key):
        m = UNet3D(in_channels=4, num_classes=3, **SMALL)
        x = jnp.zeros((2, 16, 32, 16, 4))
        vars_ = m.init(rng_key, x)
        y = m.apply(vars_, x)
        assert y.shape == (2, 16, 32, 16, 3)

    def test_jit_and_grad(self, rng_key):
        m = UNet3D(in_channels=1, num_classes=1, **SMALL, num_res_units=1)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 16, 1), jnp.float32)
        vars_ = m.init(rng_key, x)

        @jax.jit
        def loss_fn(params, x):
            y = m.apply({"params": params}, x)
            return jnp.mean(y**2)

        g = jax.grad(loss_fn)(vars_["params"], x)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.sum(jnp.abs(l))) > 0 for l in leaves)

    def test_batch_norm_mode(self, rng_key):
        m = UNet3D(in_channels=1, num_classes=1, norm="BATCH", **SMALL, num_res_units=1)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 16, 1), jnp.float32)
        vars_ = m.init(rng_key, x, train=True)
        assert "batch_stats" in vars_
        y, updates = m.apply(vars_, x, train=True, mutable=["batch_stats"])
        assert y.shape == (2, 16, 16, 16, 1)
        # eval mode uses running stats, no mutation needed
        y2 = m.apply(vars_, x, train=False)
        assert np.isfinite(np.asarray(y2)).all()

    def test_instance_norm_stateless(self, rng_key):
        m = UNet3D(in_channels=1, num_classes=1, norm="INSTANCE", **SMALL, num_res_units=1)
        x = jnp.zeros((1, 16, 16, 16, 1))
        vars_ = m.init(rng_key, x)
        assert "batch_stats" not in vars_

    def test_bad_strides_raises(self):
        with pytest.raises(ValueError, match="strides"):
            UNet3D.from_config(ConfigNode({"channels": [4, 8], "strides": [2, 2]}))

    def test_wrong_channels_raises(self, rng_key):
        m = UNet3D(in_channels=2, num_classes=1, **SMALL)
        with pytest.raises(ValueError, match="input channels"):
            m.init(rng_key, jnp.zeros((1, 16, 16, 16, 3)))


class TestDeepSupervision:
    """nnU-Net-style aux heads (deep_supervision=k): sown under train=True
    only, at the k next-coarser decoder resolutions."""

    def _model(self, ds):
        return UNet3D(in_channels=2, num_classes=1, deep_supervision=ds, **SMALL)

    def test_aux_heads_and_shapes(self, rng_key):
        m = self._model(2)
        x = jnp.zeros((1, 16, 16, 16, 2))
        v = m.init(rng_key, x, train=True)
        assert "ds_head1" in v["params"] and "ds_head2" in v["params"]
        # flax init denies the intermediates collection by default
        assert set(v.keys()) == {"params"}
        y, upd = m.apply({"params": v["params"]}, x, train=True, mutable=["intermediates"])
        assert y.shape == (1, 16, 16, 16, 1)
        inter = upd["intermediates"]
        assert inter["ds1"][0].shape == (1, 8, 8, 8, 1)
        assert inter["ds2"][0].shape == (1, 4, 4, 4, 1)

    def test_eval_forward_identical_to_plain(self, rng_key):
        """The aux heads run only under train=True; with path-stable flax
        param RNG the eval forward must be bit-identical to deep_supervision=0
        initialized from the same key."""
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 16, 2), jnp.float32)
        v_ds = self._model(2).init(rng_key, x, train=True)
        v_0 = self._model(0).init(rng_key, x, train=True)
        y_ds = self._model(2).apply({"params": v_ds["params"]}, x, train=False)
        y_0 = self._model(0).apply({"params": v_0["params"]}, x, train=False)
        np.testing.assert_array_equal(np.asarray(y_ds), np.asarray(y_0))

    def test_capped_at_available_levels(self, rng_key):
        # k beyond n_levels-1 clamps instead of erroring
        m = self._model(99)
        x = jnp.zeros((1, 16, 16, 16, 2))
        v = m.init(rng_key, x, train=True)
        heads = [k for k in v["params"] if k.startswith("ds_head")]
        assert sorted(heads) == ["ds_head1", "ds_head2", "ds_head3"]

    def test_from_config_reads_key(self):
        cfg = ConfigNode(
            {"channels": [4, 8, 16, 32, 64], "strides": [2, 2, 2, 2], "deep_supervision": 2}
        )
        assert UNet3D.from_config(cfg).deep_supervision == 2


class TestMidFusion:
    def test_registered_both_names(self):
        assert get_model("unet_multimodal_midfusion") is MultimodalUNetMidFusion
        assert get_model("unet_multimodal_deepfusion") is MultimodalUNetMidFusion

    def test_forward_shape(self, rng_key):
        m = MultimodalUNetMidFusion(
            num_modalities=4, num_classes=3, channels=(2, 4, 8, 16, 32), strides=(2, 2, 2, 2),
            num_res_units=1,
        )
        x = jnp.zeros((1, 16, 16, 16, 4))
        vars_ = m.init(rng_key, x)
        y = m.apply(vars_, x)
        assert y.shape == (1, 16, 16, 16, 3)

    def test_domain_logits(self, rng_key):
        m = MultimodalUNetMidFusion(
            num_modalities=2, num_classes=1, channels=(2, 4, 8, 16, 32), strides=(2, 2, 2, 2),
            num_res_units=1, domain_enabled=True,
        )
        x = jnp.zeros((3, 16, 16, 16, 2))
        vars_ = m.init(rng_key, x)
        y, dom = m.apply(vars_, x, return_domain_logits=True)
        assert y.shape == (3, 16, 16, 16, 1)
        assert dom.shape == (3 * 2, 2)  # [B*M, M]

    def test_from_config(self):
        cfg = ConfigNode(
            {
                "num_modalities": 4,
                "num_classes": 3,
                "channels": [2, 4, 8, 16, 32],
                "domain_classifier": {"enabled": False, "loss_weight": 0.0},
            }
        )
        m = MultimodalUNetMidFusion.from_config(cfg)
        assert m.num_modalities == 4 and not m.domain_enabled
        assert m.get_domain_loss_weight() == 0.0


class TestUNetWS:
    def test_registered_and_shapes(self, rng_key):
        from multimodal_tta_tpu.models.unet3d_ws import UNet3DWS, depth_to_space_3d, space_to_depth_3d

        assert get_model("unet_ws") is UNet3DWS
        m = UNet3DWS(in_channels=2, num_classes=1, channels=(4, 8, 16, 32, 64),
                     strides=(2, 2, 2, 2), num_res_units=1)
        x = jnp.zeros((1, 16, 16, 16, 2))
        v = m.init(rng_key, x)
        y = m.apply(v, x)
        assert y.shape == (1, 16, 16, 16, 1)

    def test_space_depth_roundtrip(self):
        from multimodal_tta_tpu.models.unet3d_ws import depth_to_space_3d, space_to_depth_3d

        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 6, 8, 3), jnp.float32)
        assert np.allclose(np.asarray(depth_to_space_3d(space_to_depth_3d(x))), np.asarray(x))

    def test_grad_flows(self, rng_key):
        import jax as _jax
        from multimodal_tta_tpu.models.unet3d_ws import UNet3DWS

        m = UNet3DWS(in_channels=1, num_classes=2, channels=(2, 4, 8, 16, 32),
                     strides=(2, 2, 2, 2), num_res_units=1)
        x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 16, 1), jnp.float32)
        v = m.init(rng_key, x)
        g = _jax.grad(lambda p: jnp.mean(m.apply({"params": p}, x) ** 2))(v["params"])
        assert all(np.isfinite(np.asarray(l)).all() for l in _jax.tree_util.tree_leaves(g))
