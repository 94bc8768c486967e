"""SwinUNETR (models/swin_unetr.py): hierarchical shifted-window transformer
encoder + UNETR-style conv decoder. Beyond-reference family — the reference
has conv UNets only (reference src/models/unet.py); output contract matches
UNet3D so the whole seg/TTA engine applies unchanged.

Covers the windowing machinery with semantic oracles: partition/unpartition
roundtrip, window locality (no cross-window information flow without shift),
shifted-window mixing, and the cyclic-shift mask blocking wrap-around
attention — plus the standard model-family contract tests (registry,
from_config, remat equivalence, grads, odd-resolution pad/crop, TTA engine).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.models.swin_unetr import (
    SwinBlock,
    SwinUNETR,
    _partition,
    _rel_pos_index,
    _shift_mask,
    _unpartition,
)
from multimodal_tta_tpu.registry import get_model


@pytest.fixture
def rng_key():
    return jax.random.PRNGKey(0)


TINY = dict(feature_size=4, depths=(1, 1), num_heads=(2, 4), window_size=2,
            patch_size=2)


def _model(**kw):
    args = dict(in_channels=2, num_classes=1, **TINY)
    args.update(kw)
    return SwinUNETR(**args)


class TestWindowing:
    def test_partition_roundtrip(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 4, 6, 8, 3), jnp.float32)
        w = (2, 3, 4)
        xw = _partition(x, w)
        assert xw.shape == (2 * 2 * 2 * 2, 2 * 3 * 4, 3)
        back = _unpartition(xw, w, (4, 6, 8), 2)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_rel_pos_index_symmetric_range(self):
        w = (2, 3, 2)
        idx = _rel_pos_index(w)
        n = 2 * 3 * 2
        assert idx.shape == (n, n)
        assert idx.min() >= 0
        assert idx.max() < (2 * 2 - 1) * (2 * 3 - 1) * (2 * 2 - 1)
        # relative displacement 0 maps every diagonal entry to the same slot
        assert len(set(np.diag(idx))) == 1
        # index(i,j) and index(j,i) are mirror displacements: distinct unless 0
        assert idx[0, 1] != idx[1, 0]

    def test_shift_mask_none_without_shift(self):
        assert _shift_mask((4, 4, 4), (2, 2, 2), (0, 0, 0)) is None

    def test_shift_mask_blocks_wrapped_pairs(self):
        """dims=4, window=2, shift=1 along one axis: the last window holds
        one token from the volume bottom and one wrapped from the top —
        masked apart; the first window is contiguous — unmasked."""
        mask = _shift_mask((4, 1, 1), (2, 1, 1), (1, 0, 0))
        assert mask.shape == (2, 2, 2)
        np.testing.assert_array_equal(mask[0], 0.0)  # contiguous window
        assert mask[1, 0, 1] == -1e9 and mask[1, 1, 0] == -1e9
        assert mask[1, 0, 0] == 0.0 and mask[1, 1, 1] == 0.0


class TestSwinBlockSemantics:
    def _block_out(self, x, shift):
        blk = SwinBlock(dim=4, heads=2, window=(2, 2, 2), shift=shift)
        v = blk.init(jax.random.PRNGKey(0), x)
        return blk, v, blk.apply(v, x)

    def test_window_locality_without_shift(self):
        """Without shift, a perturbation inside one window must not change
        any output outside that window (attention is windowed; LN/MLP are
        per-token)."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 4, 4, 4, 4), jnp.float32)
        blk, v, y0 = self._block_out(x, shift=False)
        # perturb ONE channel (an all-channel constant is LayerNorm-invariant
        # and would never reach the attention)
        x2 = x.at[0, 0, 0, 0, 0].add(1.0)  # inside window (0,0,0)
        y2 = blk.apply(v, x2)
        diff = np.abs(np.asarray(y2 - y0)).max(axis=-1)[0]
        # information propagates to OTHER tokens of the same window ...
        assert diff[1, 1, 1] > 0
        # ... and to no token outside it
        assert diff[2:, :, :].max() == 0.0
        assert diff[:, 2:, :].max() == 0.0
        assert diff[:, :, 2:].max() == 0.0

    def test_shift_mixes_across_window_boundary(self):
        """With shift, tokens adjacent across the unshifted window boundary
        DO interact (that's the point of SW-MSA)."""
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 4, 4, 4, 4), jnp.float32)
        blk, v, y0 = self._block_out(x, shift=True)
        x2 = x.at[0, 1, 1, 1, 0].add(1.0)
        y2 = blk.apply(v, x2)
        diff = np.abs(np.asarray(y2 - y0)).max(axis=-1)[0]
        # (1,1,1) and (2,2,2) are in different unshifted windows but the same
        # shifted window (shift 1): influence crosses the boundary
        assert diff[2, 2, 2] > 0

    def test_shift_mask_blocks_wraparound_flow(self):
        """The cyclic shift wraps tokens from opposite volume ends into one
        physical window; the mask must keep them from attending: perturbing
        d=0 must not change the output at d=3 (they share a rolled window
        along each axis)."""
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 4, 4, 4, 4), jnp.float32)
        blk, v, y0 = self._block_out(x, shift=True)
        x2 = x.at[0, 0, 0, 0, 0].add(1.0)
        y2 = blk.apply(v, x2)
        diff = np.abs(np.asarray(y2 - y0)).max(axis=-1)[0]
        assert diff[3, 3, 3] == 0.0
        assert diff[3, 0, 0] == 0.0
        # (0,0,0) is the sole member of its mask region inside the wrapped
        # window, so nothing else changes either — every off-site diff is 0
        assert (diff > 0).sum() == 1


class TestSwinUNETR:
    def test_registered(self):
        assert get_model("swin_unetr") is SwinUNETR

    def test_from_config(self):
        cfg = ConfigNode(
            {"in_channels": 4, "num_classes": 3, "feature_size": 12,
             "depths": [2, 2], "num_heads": [3, 6], "window_size": 7,
             "patch_size": 2}
        )
        m = get_model("swin_unetr").from_config(cfg, dtype=jnp.bfloat16, remat=2)
        assert m.in_channels == 4 and m.feature_size == 12
        assert m.depths == (2, 2) and m.num_heads == (3, 6)
        assert m.dtype == jnp.bfloat16 and m.remat == 2

    def test_forward_shape_and_dtype(self, rng_key):
        m = _model(num_classes=3, depths=(2, 1), num_heads=(2, 4))
        x = jnp.zeros((2, 16, 16, 16, 2))
        v = m.init(rng_key, x, train=True)
        y = m.apply(v, x, train=False)
        assert y.shape == (2, 16, 16, 16, 3)
        assert y.dtype == jnp.float32
        assert "batch_stats" not in v

    def test_odd_resolution_pad_crop(self, rng_key):
        """Stage resolutions that don't divide by the window (and odd dims
        hitting PatchMerging) pad to the grid and crop back."""
        m = _model()
        x = jnp.zeros((1, 12, 20, 12, 2))
        v = m.init(rng_key, x)
        assert m.apply(v, x).shape == (1, 12, 20, 12, 1)

    def test_jit_and_grad(self, rng_key):
        m = _model(in_channels=1)
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
        m = _model()
        x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 16, 2), jnp.float32)
        v = m.init(rng_key, x)
        y = m.apply(v, x)
        for r in (True, 2):
            y_r = m.clone(remat=r).apply(v, x)
            np.testing.assert_array_equal(np.asarray(y_r), np.asarray(y))

    def test_indivisible_patch_raises(self, rng_key):
        m = _model()
        with pytest.raises(ValueError, match="divisible by"):
            m.init(rng_key, jnp.zeros((1, 15, 16, 16, 2)))

    def test_wrong_channels_raises(self, rng_key):
        m = _model()
        with pytest.raises(ValueError, match="input channels"):
            m.init(rng_key, jnp.zeros((1, 16, 16, 16, 3)))

    def test_norm_mask_tags_ln_and_in(self, rng_key):
        """Tent's structural tagging finds the encoder LayerNorms and the
        decoder InstanceNorms; kernels stay untagged."""
        from multimodal_tta_tpu.tta import norm_param_mask

        m = _model()
        v = m.init(rng_key, jnp.zeros((1, 16, 16, 16, 2)), train=True)
        mask = norm_param_mask(v["params"])
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        tagged = {jax.tree_util.keystr(p) for p, val in flat if val}
        untagged = {jax.tree_util.keystr(p) for p, val in flat if not val}
        assert any("stage0_block0" in k and "ln_attn" in k for k in tagged), tagged
        assert any("dec0_" in k for k in tagged)
        assert any("patch_embed" in k for k in untagged)
        assert not any("rel_pos_bias" in k for k in tagged)

    def test_tent_adapts(self, rng_key):
        """Full TTA engine on SwinUNETR unchanged: entropy finite, norm
        params move, embeddings/head frozen."""
        import optax

        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.registry import get_tta_method

        m = _model()
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
                          or "rel_pos_bias" in jax.tree_util.keystr(p)
                          or "head" in jax.tree_util.keystr(p).split("/")[-1])
        ]
        assert not frozen_moved, frozen_moved

    def test_data_space_mesh_forward(self, rng_key):
        """Forward over a data×space mesh matches the single-device layout
        (the decoder conv blocks carry the framework's activation pins)."""
        from multimodal_tta_tpu.parallel.mesh import make_mesh

        m = _model()
        x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, 16, 2), jnp.float32)
        v = m.init(rng_key, x)
        ref = m.apply(v, x)
        mesh = make_mesh(jax.devices()[:8], data=2, space=4)
        with mesh:
            out = jax.device_get(jax.jit(m.apply)(v, x))
        np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-5)
