"""ZeRO-1 optimizer-state sharding (training.zero1) + Adafactor.

The memory story for data-parallel training past the measured single-chip
wall (BASELINE.md: Adam moments put model.moe_experts=8 246M over v5e HBM):

  - ``training.zero1`` shards every optimizer-state leaf over the mesh
    ``data`` axis (parallel/mesh.py train_state_sharding) — each device
    updates 1/dp of the moments and XLA all-gathers only the param update.
    Numerics are identical to plain DP (the moment math is elementwise).
  - ``training.optimizer=adafactor`` replaces the full second moment with
    factored row/col statistics (Shazeer & Stern 2018) — a single-chip
    memory cut, no mesh required.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.optim import build_optimizer
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.core.trainers.seg_trainer import SegTrainer
from multimodal_tta_tpu.models.unet3d import UNet3D
from multimodal_tta_tpu.parallel.mesh import make_mesh, train_state_sharding


def _cfg(zero1=False, optimizer="adam", opt_over=None):
    opts = {
        "adam": {"lr": 1e-3, "weight_decay": 0.0},
        "adafactor": {"lr": 1e-3, "weight_decay": 0.0},
    }
    if opt_over:
        opts[optimizer].update(opt_over)
    return ConfigNode(
        {
            "task": {"seed": 0},
            "model": {},
            "training": {
                "zero1": zero1,
                "optimizer": optimizer,
                "optimizers": opts,
                "param_groups": {
                    "no_decay_keys": ["bias", "norm"],
                    "treat_1d_as_no_decay": True,
                },
                "criterion": {"sigmoid": True, "lambda_dice": 1.0, "lambda_ce": 1.0},
            },
        }
    )


def _unet():
    return UNet3D(in_channels=2, num_classes=1, channels=(8, 16), strides=(2,))


def _batch(b=8, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.randn(b, 8, 16, 16, 2).astype(np.float32),
        "label": (rng.rand(b, 8, 16, 16, 1) > 0.7).astype(np.float32),
    }


def _train(zero1: bool, steps=3, optimizer="adam"):
    model = _unet()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 2)))
    cfg = _cfg(zero1=zero1, optimizer=optimizer)
    tx, _ = build_optimizer(cfg.training, v["params"])
    mesh = make_mesh(jax.devices(), data=8)
    with mesh:
        tr = SegTrainer(cfg, mesh=mesh)
        tr.state = TrainState.create(
            apply_fn=model.apply, params=v["params"], batch_stats={}, tx=tx
        )
        losses = []
        for i in range(steps):
            met = dict(tr.run_step(_batch(seed=i)))
            met.update(tr.flush_step_metrics())
            losses.append(met["loss"])
    return tr, losses


class TestZero1:
    def test_numerics_match_plain_dp(self):
        """zero1 is a memory layout, not an algorithm: losses and final
        params match plain data parallelism."""
        tr0, l0 = _train(zero1=False)
        tr1, l1 = _train(zero1=True)
        np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-6)
        p0 = jax.tree_util.tree_leaves(tr0.state.params)
        p1 = jax.tree_util.tree_leaves(tr1.state.params)
        for a, b in zip(p0, p1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_moments_sharded_params_replicated(self):
        tr, _ = _train(zero1=True, steps=1)
        mu = tr.state.opt_state.inner_state[0][0].mu
        specs = [
            str(leaf.sharding.spec)
            for leaf in jax.tree_util.tree_leaves(mu)
            if getattr(leaf, "ndim", 0) >= 1
        ]
        # every moment with a data-divisible dim is actually sharded
        assert any("data" in s for s in specs), specs
        # conv kernels (last dim = out channels, divisible by 8) must shard
        k_mu = mu["enc0"]["unit0"]["conv"]["kernel"]
        assert "data" in str(k_mu.sharding.spec)
        # params stay replicated (forward/backward unchanged)
        k_p = tr.state.params["enc0"]["unit0"]["conv"]["kernel"]
        assert str(k_p.sharding.spec) == "PartitionSpec()"

    def test_spec_rule_picks_largest_divisible_dim(self):
        mesh = make_mesh(jax.devices(), data=8)
        model = _unet()
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 2)))
        tx, _ = build_optimizer(_cfg().training, v["params"])
        state = TrainState.create(
            apply_fn=model.apply, params=v["params"], tx=tx
        )
        sh = train_state_sharding(mesh, state, zero1=True)
        # kernel (3,3,3,2,8): only the out-channel dim divides 8
        spec = sh.opt_state.inner_state[0][0].mu["enc0"]["unit0"]["conv"]["kernel"].spec
        assert tuple(spec) == (None, None, None, None, "data")
        # params replicated
        assert tuple(sh.params["enc0"]["unit0"]["conv"]["kernel"].spec) == ()
        # scalars (count, learning_rate) replicated
        assert tuple(sh.opt_state.hyperparams["learning_rate"].spec) == ()

    def test_composes_with_expert_axis(self):
        """On a data x expert mesh, MoE moments keep dim 0 on ``expert`` and
        ZeRO-shard a later dim over ``data``."""
        import optax

        from multimodal_tta_tpu.models.unetr import UNETR

        mesh = make_mesh(jax.devices(), data=2, expert=4)
        model = UNETR(
            in_channels=2, num_classes=1, patch_size=4, hidden_size=16,
            mlp_dim=32, num_heads=2, num_layers=2, feature_size=4,
            moe_experts=4, moe_every=2,
        )
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 2)))
        state = TrainState.create(
            apply_fn=model.apply, params=v["params"], tx=optax.adam(1e-3)
        )
        sh = train_state_sharding(mesh, state, zero1=True)
        spec = sh.opt_state[0].mu["block1"]["moe"]["wi"].spec  # (E, 16, 32)
        assert spec[0] == "expert" and "data" in tuple(spec)[1:]
        # expert params themselves keep the expert-only sharding
        assert tuple(sh.params["block1"]["moe"]["wi"].spec) == ("expert", None, None)


class TestAdafactor:
    def test_trains_and_loss_decreases(self):
        tr, losses = _train(zero1=False, steps=6, optimizer="adafactor")
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_factored_second_moment_saves_memory(self):
        """With factoring enabled for small dims, total optimizer state is a
        small fraction of Adam's 2x params."""
        import optax

        model = _unet()
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 2)))
        n_params = sum(l.size for l in jax.tree_util.tree_leaves(v["params"]))

        cfg = _cfg(optimizer="adafactor", opt_over={"min_dim_size_to_factor": 4})
        tx, _ = build_optimizer(cfg.training, v["params"])
        opt_state = tx.init(v["params"])
        n_opt = sum(l.size for l in jax.tree_util.tree_leaves(opt_state))

        tx_adam, _ = build_optimizer(_cfg(optimizer="adam").training, v["params"])
        n_adam = sum(l.size for l in jax.tree_util.tree_leaves(tx_adam.init(v["params"])))

        assert n_adam >= 2 * n_params  # mu + nu
        # memory-lean mode: no mu slot, factored nu for every >=2D tensor
        assert n_opt < 0.6 * n_adam, (n_opt, n_adam, n_params)

    def test_rejects_unknown_optimizer(self):
        import pytest

        model = _unet()
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 2)))
        cfg = ConfigNode({"optimizer": "lion", "optimizers": {}})
        with pytest.raises(ValueError, match="Unsupported optimizer"):
            build_optimizer(cfg, v["params"])
