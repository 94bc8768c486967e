"""Gradient accumulation (training.grad_accum).

k microbatches of batch_size are averaged into one optimizer update
(optax.MultiSteps inside core/optim.build_optimizer), so the effective batch
is k*batch_size at the activation memory of one microbatch — the single-chip
path past whole-volume HBM walls (BASELINE.md hard-part 4, where BraTS
multimodal batch>1 OOMs one v5e chip).

Contracts proven here:
  - k microsteps of batch b produce the SAME params as one step of batch k*b
    (per-sample loss means make the grad average exact, not approximate)
  - params are frozen on accumulate-only microsteps
  - the EMA shadow ticks only on the apply boundary (seg_trainer gates the
    decay on opt_state.mini_step)
  - the epoch scheduler's set/get_learning_rate reach through the MultiSteps
    wrapper state
  - training.zero1 shards the grad accumulator over the data axis like any
    other opt_state leaf
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.optim import (
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.core.trainers.seg_trainer import SegTrainer
from multimodal_tta_tpu.models.unet3d import UNet3D
from multimodal_tta_tpu.parallel.mesh import make_mesh


def _cfg(grad_accum=1, zero1=False, ema=False):
    return ConfigNode(
        {
            "task": {"seed": 0},
            "model": {},
            "training": {
                "grad_accum": grad_accum,
                "zero1": zero1,
                "ema": {"enabled": ema, "decay": 0.5},
                "optimizer": "adam",
                "optimizers": {"adam": {"lr": 1e-2, "weight_decay": 0.0}},
                "criterion": {"sigmoid": True, "lambda_dice": 1.0, "lambda_ce": 1.0},
            },
        }
    )


def _unet():
    return UNet3D(in_channels=2, num_classes=1, channels=(8, 16), strides=(2,))


def _data(n=8, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.randn(n, 8, 16, 16, 2).astype(np.float32),
        (rng.rand(n, 8, 16, 16, 1) > 0.7).astype(np.float32),
    )


def _trainer(cfg, params, apply_fn, data_axis):
    # the jitted step donates the state, so each trainer needs its own buffers
    params = jax.tree_util.tree_map(jnp.copy, params)
    tx, _ = build_optimizer(cfg.training, params)
    mesh = make_mesh(jax.devices()[:data_axis], data=data_axis)
    tr = SegTrainer(cfg, mesh=mesh)
    tr.state = TrainState.create(
        apply_fn=apply_fn, params=params, batch_stats={}, tx=tx
    )
    return tr, mesh


def _run(tr, mesh, batches):
    with mesh:
        for img, lbl in batches:
            tr.run_step({"image": img, "label": lbl})
        tr.flush_step_metrics()
    return tr


def test_accum_matches_large_batch():
    model = _unet()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 2)))
    img, lbl = _data(8)

    tr_big, mesh_big = _trainer(_cfg(grad_accum=1), v["params"], model.apply, 2)
    _run(tr_big, mesh_big, [(img, lbl)])

    tr_acc, mesh_acc = _trainer(_cfg(grad_accum=4), v["params"], model.apply, 2)
    micro = [(img[i : i + 2], lbl[i : i + 2]) for i in range(0, 8, 2)]
    _run(tr_acc, mesh_acc, micro)

    for a, b in zip(
        jax.tree_util.tree_leaves(tr_big.state.params),
        jax.tree_util.tree_leaves(tr_acc.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_params_frozen_until_boundary():
    model = _unet()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 2)))
    img, lbl = _data(4)
    tr, mesh = _trainer(_cfg(grad_accum=2), v["params"], model.apply, 2)
    p0 = jax.tree_util.tree_map(np.asarray, v["params"])

    _run(tr, mesh, [(img[:2], lbl[:2])])  # accumulate-only
    for a, b in zip(
        jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(tr.state.params)
    ):
        np.testing.assert_array_equal(a, np.asarray(b))

    _run(tr, mesh, [(img[2:], lbl[2:])])  # apply
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(tr.state.params)
        )
    )
    assert moved, "params did not move after the apply boundary"


def test_ema_ticks_only_on_boundary():
    model = _unet()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 2)))
    img, lbl = _data(4)
    tr, mesh = _trainer(_cfg(grad_accum=2, ema=True), v["params"], model.apply, 2)
    p0 = jax.tree_util.tree_map(np.asarray, v["params"])

    _run(tr, mesh, [(img[:2], lbl[:2])])  # accumulate-only: shadow untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(p0),
        jax.tree_util.tree_leaves(tr.state.ema_params),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))

    _run(tr, mesh, [(img[2:], lbl[2:])])  # apply: shadow = 0.5*old + 0.5*new
    leaves_p0 = jax.tree_util.tree_leaves(p0)
    leaves_p = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tr.state.params)
    )
    leaves_e = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tr.state.ema_params)
    )
    for a, p, e in zip(leaves_p0, leaves_p, leaves_e):
        np.testing.assert_allclose(e, 0.5 * a + 0.5 * p, atol=1e-6, rtol=1e-6)


def test_lr_reaches_through_multisteps():
    model = _unet()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 2)))
    tx, lr = build_optimizer(_cfg(grad_accum=2).training, v["params"])
    opt_state = tx.init(v["params"])
    assert np.isclose(get_learning_rate(opt_state), lr, rtol=1e-6)
    opt_state = set_learning_rate(opt_state, 5e-4)
    assert np.isclose(get_learning_rate(opt_state), 5e-4, rtol=1e-6)


def test_zero1_shards_accumulator():
    model = _unet()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 2)))
    img, lbl = _data(8)
    tr, mesh = _trainer(
        _cfg(grad_accum=2, zero1=True), v["params"], model.apply, 8
    )
    _run(tr, mesh, [(img, lbl)])
    # MultiStepsState.acc_grads leaves live under opt_state: at least one
    # multi-element leaf must be sharded (non-replicated) over the data axis
    acc = tr.state.opt_state.acc_grads
    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(acc)
        if hasattr(leaf, "sharding")
        and leaf.size > 1
        and "data" in str(getattr(leaf.sharding, "spec", ""))
    ]
    assert sharded, "no acc_grads leaf is sharded over the data axis under zero1"
