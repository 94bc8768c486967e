"""AOT serving-artifact tests (serving/export.py).

The exported program must reproduce the live jitted step bit-for-bit, and
the artifact file must round-trip through disk — including the flat state
leaves that let a deployment runtime thread continual-TTA state with no
flax/optax structure knowledge.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.models import UNet3D
from multimodal_tta_tpu.serving import (
    export_adapt_serving,
    export_forward_serving,
    load_artifact,
    save_artifact,
)
from multimodal_tta_tpu.tta.tent import TentAdapter

SHAPE = (1, 8, 8, 8, 1)  # [B,D,H,W,C]


def tiny_state(seed=0):
    m = UNet3D(
        in_channels=1,
        num_classes=1,
        channels=(2, 4, 8),
        strides=(2, 2),
        num_res_units=1,
    )
    x = np.random.RandomState(seed).randn(*SHAPE).astype(np.float32)
    v = m.init(jax.random.PRNGKey(seed), jnp.asarray(x))
    state = TrainState.create(apply_fn=m.apply, params=v["params"], tx=optax.identity())
    return state, x


def tent_cfg(**tta_over):
    node = {
        "steps": 2,
        "lr": 0.01,
        "optimizer": "sgd",
        "episodic": False,
        "entropy_focus": "uncertain",
        "predict": "inline",
    }
    node.update(tta_over)
    return ConfigNode({"tta": node, "training": {"criterion": {"sigmoid": True}}})


class TestAdaptArtifact:
    def test_roundtrip_matches_live_step(self, tmp_path):
        state, x = tiny_state()
        adapter = TentAdapter(tent_cfg().tta, config=tent_cfg(), mesh=None)
        step = adapter.build_serving_step(state, threshold=0.5, predict_mode="inline")

        exported, meta, leaves0 = export_adapt_serving(
            adapter, state, SHAPE, threshold=0.5, platforms=("cpu",)
        )
        path = os.path.join(tmp_path, "unet.mttas")
        save_artifact(path, exported, meta, leaves0)
        art = load_artifact(path)

        assert art.meta["mode"] == "adapt"
        assert art.n_state == len(leaves0)
        assert "cpu" in art.platforms

        rng = np.asarray(jax.random.PRNGKey(7))
        n_valid = np.int32(SHAPE[0])
        floor = np.float32(np.nan)

        stl = art.initial_state()
        out = art.call(*stl, x, rng, n_valid, floor)
        n = art.n_state
        ents_a, pred_a = out[n], out[n + 1]

        # live reference: the same pure step with the same key
        opt0 = adapter._tx.init(adapter.trainable_subtree(state.params))
        params, bs, opt, ents_l, pred_l = step(
            state.params, state.batch_stats, opt0, jnp.asarray(x),
            jnp.asarray(rng), n_valid, floor,
        )
        np.testing.assert_allclose(np.asarray(ents_a), np.asarray(ents_l), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(pred_a), np.asarray(pred_l))
        assert np.asarray(pred_a).dtype == np.uint8
        assert np.asarray(ents_a).shape == (2,)

        # updated params thread back in the SAME leaf order
        live_leaves = jax.tree_util.tree_flatten((params, bs, opt))[0]
        for got, want in zip(out[:n], live_leaves):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    def test_continual_threading_two_batches(self, tmp_path):
        """Feeding batch-1 outputs as batch-2 state must equal the live
        two-batch continual sequence."""
        state, x1 = tiny_state()
        x2 = np.random.RandomState(9).randn(*SHAPE).astype(np.float32)
        adapter = TentAdapter(tent_cfg().tta, config=tent_cfg(), mesh=None)
        step = adapter.build_serving_step(state, threshold=0.5, predict_mode="inline")

        exported, meta, leaves0 = export_adapt_serving(
            adapter, state, SHAPE, threshold=0.5, platforms=("cpu",)
        )
        path = os.path.join(tmp_path, "a.mttas")
        save_artifact(path, exported, meta, leaves0)
        art = load_artifact(path)
        n = art.n_state

        k1 = np.asarray(jax.random.PRNGKey(1))
        k2 = np.asarray(jax.random.PRNGKey(2))
        nv, fl = np.int32(1), np.float32(np.nan)

        st = art.initial_state()
        out1 = art.call(*st, x1, k1, nv, fl)
        out2 = art.call(*out1[:n], x2, k2, nv, fl)
        pred2_art = np.asarray(out2[n + 1])

        opt0 = adapter._tx.init(adapter.trainable_subtree(state.params))
        p, b, o, _, _ = step(state.params, state.batch_stats, opt0,
                             jnp.asarray(x1), jnp.asarray(k1), nv, fl)
        _, _, _, _, pred2_live = step(p, b, o, jnp.asarray(x2), jnp.asarray(k2), nv, fl)
        np.testing.assert_array_equal(pred2_art, np.asarray(pred2_live))

    def test_fisher_rejected(self):
        state, _ = tiny_state()
        c = tent_cfg(fisher={"enabled": True, "lambda": 1.0})
        adapter = TentAdapter(c.tta, config=c, mesh=None)
        with pytest.raises(ValueError, match="[Ff]isher"):
            export_adapt_serving(adapter, state, SHAPE, threshold=0.5, platforms=("cpu",))

    def test_multiplatform_lowering_includes_tpu(self, tmp_path):
        """A TPU-servable artifact lowers on a CPU-only host."""
        state, x = tiny_state()
        adapter = TentAdapter(tent_cfg(steps=1).tta, config=tent_cfg(), mesh=None)
        exported, meta, leaves0 = export_adapt_serving(
            adapter, state, SHAPE, threshold=0.5, platforms=("tpu", "cpu")
        )
        path = os.path.join(tmp_path, "mp.mttas")
        save_artifact(path, exported, meta, leaves0)
        art = load_artifact(path)
        assert set(art.platforms) == {"tpu", "cpu"}
        out = art.call(
            *art.initial_state(), x, np.asarray(jax.random.PRNGKey(0)),
            np.int32(1), np.float32(np.nan),
        )
        assert np.asarray(out[art.n_state + 1]).shape == SHAPE


class TestMethodFamilies:
    @pytest.mark.parametrize("method", ["cotta", "sar", "memo"])
    def test_extended_state_methods_export(self, method, tmp_path):
        """CoTTA (EMA teacher) and SAR (entropy EMA) carry extra state; the
        flat protocol must thread it and reproduce the live step. MEMO
        carries no extra state but its view ensemble must export."""
        from multimodal_tta_tpu.registry import get_tta_method

        state, x = tiny_state()
        over = {"method": method, "predict": "inline"}
        if method == "sar":
            over["optimizer"] = "sgd"
        c = tent_cfg(**over)
        adapter = get_tta_method(method)(c.tta, config=c, mesh=None)

        exported, meta, leaves0 = export_adapt_serving(
            adapter, state, SHAPE, threshold=0.5, platforms=("cpu",)
        )
        path = os.path.join(tmp_path, f"{method}.mttas")
        save_artifact(path, exported, meta, leaves0)
        art = load_artifact(path)

        rng = np.asarray(jax.random.PRNGKey(3))
        nv, fl = np.int32(1), np.float32(np.nan)
        out = art.call(*art.initial_state(), x, rng, nv, fl)
        pred_a = np.asarray(out[art.n_state + 1])

        call, state0 = adapter.serving_export_spec(state, 0.5, "inline")
        _, _, pred_l = call(state0, jnp.asarray(x), jnp.asarray(rng), nv, fl)
        np.testing.assert_array_equal(pred_a, np.asarray(pred_l))


class TestForwardArtifact:
    def test_forward_parity(self, tmp_path):
        state, x = tiny_state()

        def probs(image):
            return jax.nn.sigmoid(state.apply_fn({"params": state.params}, image, train=False))

        exported, meta = export_forward_serving(probs, SHAPE, platforms=("cpu",))
        path = os.path.join(tmp_path, "fwd.mttas")
        save_artifact(path, exported, meta)
        art = load_artifact(path)
        assert art.meta["mode"] == "forward"
        assert art.initial_state() == []
        got = np.asarray(art.call(x))
        want = np.asarray(probs(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_bad_magic_raises(self, tmp_path):
        p = os.path.join(tmp_path, "junk.mttas")
        with open(p, "wb") as f:
            f.write(b"NOTANART" + b"\x00" * 16)
        with pytest.raises(ValueError, match="magic"):
            load_artifact(p)
