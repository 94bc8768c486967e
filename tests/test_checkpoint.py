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


class TestShardedOrbax:
    """Multi-host-safe sharded format (VERDICT.md item 7): per-process OCDBT
    shards, no gather to host 0; restore follows the template's shardings."""

    def _mesh(self, shape=(4, 2)):
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
        return Mesh(devs, ("data", "space"))

    def _sharded_state(self, mesh, seed=0):
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = make_state(seed)
        rep = NamedSharding(mesh, P())
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, state
        )
        # one genuinely sharded leaf: a per-sample accumulator over `data`
        big = jnp.arange(32.0).reshape(8, 4)
        big = jax.device_put(big, NamedSharding(mesh, P("data")))
        return state.replace(batch_stats={"acc": big})

    def test_sharded_roundtrip_on_mesh(self, tmp_path):
        from multimodal_tta_tpu.core.checkpoint import (
            load_checkpoint_sharded,
            save_checkpoint_sharded,
        )

        mesh = self._mesh()
        state = self._sharded_state(mesh)
        path = str(tmp_path / "sh")
        save_checkpoint_sharded(path, state, {"epoch": 4, "best_metrics": {"loss": 0.1}})
        assert os.path.isdir(path + ".orbax")

        fresh = self._sharded_state(mesh, seed=99)
        restored, extra = load_checkpoint_sharded(path, fresh)
        assert extra["epoch"] == 4
        np.testing.assert_allclose(
            np.asarray(restored.batch_stats["acc"]), np.arange(32.0).reshape(8, 4)
        )
        # sharding preserved from the template
        assert restored.batch_stats["acc"].sharding == state.batch_stats["acc"].sharding
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(state.params)),
            jax.tree_util.tree_leaves(jax.device_get(restored.params)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_load_checkpoint_autodetects_orbax(self, tmp_path):
        from multimodal_tta_tpu.core.checkpoint import save_checkpoint_sharded

        mesh = self._mesh()
        state = self._sharded_state(mesh)
        path = str(tmp_path / "auto")
        save_checkpoint_sharded(path, state, {"epoch": 2})
        restored, extra = load_checkpoint(path, self._sharded_state(mesh, seed=7))
        assert extra["epoch"] == 2
        np.testing.assert_allclose(
            np.asarray(restored.batch_stats["acc"]), np.arange(32.0).reshape(8, 4)
        )

    def test_newer_msgpack_beats_stale_orbax(self, tmp_path):
        """A run that switched checkpoint_format leaves BOTH formats at the
        same path; the sidecar is shared, so auto-detect must restore the
        NEWER payload (previously the stale orbax dir silently won)."""
        import time as _time

        from multimodal_tta_tpu.core.checkpoint import save_checkpoint_sharded

        mesh = self._mesh()
        path = str(tmp_path / "both")
        save_checkpoint_sharded(path, self._sharded_state(mesh), {"epoch": 1})
        _time.sleep(0.05)
        fresh = make_state(seed=3)
        save_checkpoint(path, fresh, {"epoch": 9})
        restored, extra = load_checkpoint(path, make_state(seed=7))
        assert extra["epoch"] == 9
        np.testing.assert_allclose(
            np.asarray(restored.params["dense"]["kernel"]),
            np.asarray(fresh.params["dense"]["kernel"]),
        )

    def test_restore_onto_different_mesh_layout(self, tmp_path):
        """A checkpoint written on a 4x2 mesh restores onto an 8x1 mesh —
        shards are re-laid-out per the TEMPLATE's shardings."""
        from multimodal_tta_tpu.core.checkpoint import (
            load_checkpoint_sharded,
            save_checkpoint_sharded,
        )

        state42 = self._sharded_state(self._mesh((4, 2)))
        path = str(tmp_path / "re")
        save_checkpoint_sharded(path, state42, {"epoch": 1})

        template81 = self._sharded_state(self._mesh((8, 1)), seed=5)
        restored, _ = load_checkpoint_sharded(path, template81)
        assert restored.batch_stats["acc"].sharding == template81.batch_stats["acc"].sharding
        np.testing.assert_allclose(
            np.asarray(restored.batch_stats["acc"]), np.arange(32.0).reshape(8, 4)
        )

    def test_sharded_resume_drill(self, tmp_path):
        """Preemption drill in the sharded format: resume-continued training
        matches uninterrupted training exactly."""
        from multimodal_tta_tpu.core.checkpoint import (
            load_checkpoint_sharded,
            save_checkpoint_sharded,
        )

        mesh = self._mesh()

        def step(state, g_seed):
            grads = jax.tree_util.tree_map(
                lambda p: jax.random.normal(jax.random.PRNGKey(g_seed), p.shape),
                state.params,
            )
            return state.apply_gradients(grads)

        s_full = self._sharded_state(mesh)
        for i in range(6):
            s_full = step(s_full, i)

        s_a = self._sharded_state(mesh)
        for i in range(3):
            s_a = step(s_a, i)
        path = str(tmp_path / "drill")
        save_checkpoint_sharded(path, s_a, {"epoch": 2})

        s_b, _ = load_checkpoint_sharded(path, self._sharded_state(mesh, seed=123))
        for i in range(3, 6):
            s_b = step(s_b, i)

        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(s_full.params)),
            jax.tree_util.tree_leaves(jax.device_get(s_b.params)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_sidecar_format_beats_mtimes(self, tmp_path):
        """Format disambiguation is sidecar-driven: even if the stale orbax
        dir gets a NEWER mtime (tar/scp rewrite), the declared format wins."""
        import os as _os
        import time as _time

        from multimodal_tta_tpu.core.checkpoint import save_checkpoint_sharded

        mesh = self._mesh()
        path = str(tmp_path / "decl")
        save_checkpoint_sharded(path, self._sharded_state(mesh), {"epoch": 1})
        _time.sleep(0.05)
        fresh = make_state(seed=5)
        save_checkpoint(path, fresh, {"epoch": 7})
        # simulate a copy that rewrites the orbax dir mtime to be newest
        _os.utime(path + ".orbax")
        restored, extra = load_checkpoint(path, make_state(seed=9))
        assert extra["epoch"] == 7
        np.testing.assert_allclose(
            np.asarray(restored.params["dense"]["kernel"]),
            np.asarray(fresh.params["dense"]["kernel"]),
        )
