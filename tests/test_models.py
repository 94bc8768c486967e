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


class TestUNETR:
    """UNETR (models/unetr.py): 3D ViT encoder + conv decoder over token
    skips. Beyond-reference family — the reference has conv UNets only
    (reference src/models/unet.py); output contract matches UNet3D so the
    whole seg/TTA engine applies unchanged."""

    TINY = dict(patch_size=4, hidden_size=32, mlp_dim=64, num_heads=4,
                num_layers=4, feature_size=4)

    def _model(self, **kw):
        from multimodal_tta_tpu.models.unetr import UNETR

        args = dict(in_channels=2, num_classes=1, **self.TINY)
        args.update(kw)
        return UNETR(**args)

    def test_registered(self):
        from multimodal_tta_tpu.models.unetr import UNETR

        assert get_model("unetr") is UNETR

    def test_from_config(self):
        cfg = ConfigNode(
            {"in_channels": 4, "num_classes": 3, "patch_size": 8,
             "hidden_size": 48, "num_layers": 6, "feature_size": 8}
        )
        m = get_model("unetr").from_config(cfg, dtype=jnp.bfloat16, remat=2)
        assert m.in_channels == 4 and m.patch_size == 8 and m.num_layers == 6
        assert m.dtype == jnp.bfloat16 and m.remat == 2

    def test_forward_shape_and_dtype(self, rng_key):
        m = self._model(num_classes=3)
        x = jnp.zeros((2, 16, 16, 16, 2))
        v = m.init(rng_key, x, train=True)
        y = m.apply(v, x, train=False)
        assert y.shape == (2, 16, 16, 16, 3)
        assert y.dtype == jnp.float32
        assert "batch_stats" not in v  # INSTANCE norm decoder is stateless

    def test_anisotropic_input(self, rng_key):
        m = self._model()
        x = jnp.zeros((1, 8, 16, 12, 2))
        v = m.init(rng_key, x)
        assert m.apply(v, x).shape == (1, 8, 16, 12, 1)

    def test_jit_and_grad(self, rng_key):
        m = self._model(in_channels=1)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 16, 1), jnp.float32)
        v = m.init(rng_key, x)

        @jax.jit
        def loss_fn(params, x):
            return jnp.mean(m.apply({"params": params}, x) ** 2)

        g = jax.grad(loss_fn)(v["params"], x)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.sum(jnp.abs(l))) > 0 for l in leaves)

    def test_remat_matches_plain(self, rng_key):
        m = self._model()
        x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 16, 2), jnp.float32)
        v = m.init(rng_key, x)
        y = m.apply(v, x)
        for r in (True, 2):
            y_r = m.clone(remat=r).apply(v, x)
            np.testing.assert_array_equal(np.asarray(y_r), np.asarray(y))

    def test_indivisible_spatial_raises(self, rng_key):
        m = self._model()
        with pytest.raises(ValueError, match="divisible by patch_size"):
            m.init(rng_key, jnp.zeros((1, 18, 16, 16, 2)))

    def test_wrong_channels_raises(self, rng_key):
        m = self._model()
        with pytest.raises(ValueError, match="input channels"):
            m.init(rng_key, jnp.zeros((1, 16, 16, 16, 3)))

    def test_bad_layer_count_raises(self, rng_key):
        m = self._model(num_layers=5)  # patch 4 -> 2 levels; 5 % 2 != 0
        with pytest.raises(ValueError, match="divisible"):
            m.init(rng_key, jnp.zeros((1, 16, 16, 16, 2)))

    def test_bad_patch_size_raises(self, rng_key):
        m = self._model(patch_size=6)
        with pytest.raises(ValueError, match="power of two"):
            m.init(rng_key, jnp.zeros((1, 12, 12, 12, 2)))

    def test_norm_mask_tags_ln_and_in(self, rng_key):
        """Tent's structural norm tagging must pick up BOTH the encoder
        LayerNorms and the decoder InstanceNorms with no model-specific
        code, and must NOT tag attention/MLP kernels."""
        from multimodal_tta_tpu.tta import norm_param_mask

        m = self._model()
        v = m.init(rng_key, jnp.zeros((1, 16, 16, 16, 2)), train=True)
        mask = norm_param_mask(v["params"])
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        tagged = {jax.tree_util.keystr(p) for p, val in flat if val}
        untagged = {jax.tree_util.keystr(p) for p, val in flat if not val}
        assert any("block0" in k and "LayerNorm" in k for k in tagged), tagged
        assert any("dec0_conv0" in k for k in tagged)
        assert any("encoder_ln" in k for k in tagged)
        assert all("attention" not in k.lower() or "LayerNorm" in k for k in tagged)
        assert any("patch_embed" in k for k in untagged)

    def test_tent_adapts(self, rng_key):
        """The full TTA engine runs on UNETR unchanged: entropy finite,
        norm params move, everything else frozen."""
        import optax

        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.registry import get_tta_method

        m = self._model()
        x0 = jnp.zeros((1, 16, 16, 16, 2))
        v = m.init(rng_key, x0, train=True)
        state = TrainState.create(
            apply_fn=m.apply, params=v["params"],
            batch_stats=v.get("batch_stats", {}), tx=optax.identity(),
        )
        cfg = ConfigNode(
            {"task": {"seed": 0}, "training": {"criterion": {"sigmoid": True}},
             "tta": {"method": "tent", "steps": 2, "lr": 1e-2, "optimizer": "sgd",
                     "momentum": 0.9, "update": "norm", "episodic": True}}
        )
        adapter = get_tta_method("tent")(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        img = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 16, 2), jnp.float32)
        adapted = adapt_fn(state, img, 2)
        assert np.isfinite(adapter.last_entropy)
        moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), adapted.params, state.params
        )
        flat = jax.tree_util.tree_flatten_with_path(moved)[0]
        assert any(d > 0 for _, d in flat), "no params moved"
        frozen_moved = [
            jax.tree_util.keystr(p) for p, d in flat
            if d > 0 and ("patch_embed" in jax.tree_util.keystr(p)
                          or "head" in jax.tree_util.keystr(p).split("/")[-1])
        ]
        assert not frozen_moved, frozen_moved

    def test_sequence_parallel_matches_unsharded(self, rng_key):
        """seq_shard_axis='space': 64 tokens shard 16/device over the space
        axis; logits match the unsharded layout."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        plain = self._model()
        sharded = self._model(seq_shard_axis="space")
        x = jnp.asarray(np.random.RandomState(3).randn(1, 16, 16, 16, 2), jnp.float32)
        v = plain.init(rng_key, x)
        ref = plain.apply(v, x)
        mesh = make_mesh(jax.devices()[:8], data=2, space=4)
        with mesh:
            y = jax.jit(lambda v, x: sharded.apply(v, x, train=False))(v, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=3e-5)


class TestSegResNet:
    """SegResNet (models/segresnet.py): Myronenko 2018 asymmetric residual
    encoder-decoder with additive skips. Beyond-reference family (the
    reference's seg models are the MONAI UNet subclass + midfusion,
    reference src/models/unet.py:14-69); output contract matches UNet3D so
    the whole seg/TTA engine applies unchanged."""

    TINY = dict(init_filters=4, blocks_down=(1, 2, 2), blocks_up=(1, 1))

    def _model(self, **kw):
        from multimodal_tta_tpu.models.segresnet import SegResNet

        args = dict(in_channels=2, num_classes=1, **self.TINY)
        args.update(kw)
        return SegResNet(**args)

    def test_registered(self):
        from multimodal_tta_tpu.models.segresnet import SegResNet

        assert get_model("segresnet") is SegResNet

    def test_from_config(self):
        cfg = ConfigNode(
            {"in_channels": 4, "num_classes": 3, "init_filters": 8,
             "blocks_down": [1, 2, 2, 4], "blocks_up": [1, 1, 1]}
        )
        m = get_model("segresnet").from_config(cfg, dtype=jnp.bfloat16, remat=2)
        assert m.in_channels == 4 and m.init_filters == 8
        assert m.blocks_down == (1, 2, 2, 4) and m.remat == 2

    def test_from_config_rejects_mismatched_stages(self):
        cfg = ConfigNode({"blocks_down": [1, 2, 2], "blocks_up": [1, 1, 1]})
        with pytest.raises(ValueError, match="blocks_up"):
            get_model("segresnet").from_config(cfg)

    def test_forward_shape_and_dtype(self, rng_key):
        m = self._model(num_classes=3)
        x = jnp.zeros((2, 16, 16, 16, 2))
        v = m.init(rng_key, x, train=True)
        y = m.apply(v, x, train=False)
        assert y.shape == (2, 16, 16, 16, 3)
        assert y.dtype == jnp.float32
        assert "batch_stats" not in v  # GroupNorm is stateless

    def test_anisotropic_and_divisibility(self, rng_key):
        m = self._model()
        x = jnp.zeros((1, 8, 16, 12, 2))
        v = m.init(rng_key, x)
        assert m.apply(v, x).shape == (1, 8, 16, 12, 1)
        with pytest.raises(ValueError, match="divisible"):
            m.init(rng_key, jnp.zeros((1, 9, 16, 12, 2)))

    def test_jit_grad_and_remat(self, rng_key):
        m = self._model(in_channels=1, remat=1)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 16, 1), jnp.float32)
        v = m.init(rng_key, x, train=True)

        @jax.jit
        def loss_fn(params, x):
            return jnp.mean(m.apply({"params": params}, x, train=True) ** 2)

        g = jax.grad(loss_fn)(v["params"], x)
        assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g))

    def test_tent_adapts_groupnorm_affines(self, rng_key):
        """The structural norm-param rule must pick up SegResNet's GroupNorm
        scale/bias (the whole TTA engine then applies unchanged)."""
        from multimodal_tta_tpu.tta import norm_param_mask

        m = self._model()
        v = m.init(rng_key, jnp.zeros((1, 8, 8, 8, 2)), train=True)
        mask = norm_param_mask(v["params"])
        n_adapted = sum(bool(x) for x in jax.tree_util.tree_leaves(mask))
        assert n_adapted >= 2 * (2 + 2 + 2) + 2  # 2 affines per norm, 2 norms per block + final
