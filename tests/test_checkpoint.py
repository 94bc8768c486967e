"""Checkpoint serialization: roundtrip, atomicity, resume continuity."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from multimodal_tta_tpu.core.optim import build_optimizer
from multimodal_tta_tpu.core.train_state import TrainState


def make_state(seed=0):
    params = {
        "dense": {"kernel": jax.random.normal(jax.random.PRNGKey(seed), (4, 4)), "bias": jnp.zeros(4)},
    }
    cfg = ConfigNode({"optimizer": "adam", "optimizers": {"adam": {"lr": 1e-3}}})
    tx, _ = build_optimizer(cfg, params)
    return TrainState.create(apply_fn=lambda v, x, **k: x, params=params, tx=tx)


class TestRoundtrip:
    def test_full_state_roundtrip(self, tmp_path):
        state = make_state()
        # take a few optimizer steps so opt_state is non-trivial
        for _ in range(3):
            grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
            state = state.apply_gradients(grads)

        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state, {"epoch": 7, "best_metrics": {"loss": 0.5}})

        fresh = make_state(seed=99)
        restored, extra = load_checkpoint(path, fresh)
        assert extra["epoch"] == 7
        assert extra["best_metrics"]["loss"] == 0.5
        assert int(restored.step) == 3
        for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
            assert np.allclose(np.asarray(a), np.asarray(b))
        # optimizer moments restored too
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(state.opt_state)),
            jax.tree_util.tree_leaves(jax.device_get(restored.opt_state)),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_atomic_write_leaves_no_tmp(self, tmp_path):
        state = make_state()
        path = str(tmp_path / "c")
        save_checkpoint(path, state, {"epoch": 0})
        files = os.listdir(tmp_path)
        assert "c.msgpack" in files and "c.json" in files
        assert not any(f.endswith(".tmp") for f in files)

    def test_resume_training_continues_identically(self, tmp_path):
        """Preemption drill: train k steps, checkpoint, 'crash', restore into
        a fresh state, continue — must match uninterrupted training exactly."""
        def step(state, g_seed):
            grads = jax.tree_util.tree_map(
                lambda p: jax.random.normal(jax.random.PRNGKey(g_seed), p.shape), state.params
            )
            return state.apply_gradients(grads)

        # uninterrupted: 6 steps
        s_full = make_state()
        for i in range(6):
            s_full = step(s_full, i)

        # interrupted at 3
        s_a = make_state()
        for i in range(3):
            s_a = step(s_a, i)
        path = str(tmp_path / "mid")
        save_checkpoint(path, s_a, {"epoch": 2})

        s_b, extra = load_checkpoint(path, make_state(seed=123))
        for i in range(3, 6):
            s_b = step(s_b, i)

        for a, b in zip(jax.tree_util.tree_leaves(s_full.params), jax.tree_util.tree_leaves(s_b.params)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
