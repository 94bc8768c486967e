"""The TTA engine on CLASSIFIERS — the literature's native setting.

Tent/MEMO/SAR/EATA were all published on corrupted-classification
benchmarks; this framework's segmentation workloads add the dense-3D
machinery on top, but the engine itself is model-agnostic. These tests
hold the proof:

  - `classifier_logits_apply` bridges the 2D backbone registry's
    ``(features, logits)`` contract (reference torchvision wrappers,
    /root/reference/src/models/resnet.py:130-161) to the adapters'
    logits-only ``apply_fn``.
  - A trained BatchNorm CNN under covariate shift recovers accuracy from
    Tent's two mechanisms with zero labels: BN statistic recompute from
    the test batch + entropy minimization on the norm affines.
  - The registered resnet18 backbone drops into the adapter unchanged
    (BN affines adapt, conv kernels frozen, running stats recomputed).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.registry import get_model, get_tta_method
from multimodal_tta_tpu.tta import TentAdapter, classifier_logits_apply, norm_param_mask


class TinyCls(nn.Module):
    """Minimal BN classifier with the backbone registry's output contract."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(8, (3, 3), (2, 2), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), (2, 2), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        feats = jnp.mean(x, axis=(1, 2))
        return feats, nn.Dense(self.num_classes)(feats)


def make_data(rng: np.random.RandomState, n: int):
    """Class 1 = a bright 4x4 square somewhere in 16x16 noise; class 0 =
    noise only. Linearly separable enough that a tiny CNN nails it."""
    x = rng.randn(n, 16, 16, 1).astype(np.float32) * 0.3
    y = rng.randint(0, 2, size=(n,))
    for i in range(n):
        if y[i] == 1:
            r, c = rng.randint(0, 12, size=2)
            x[i, r : r + 4, c : c + 4, 0] += 2.0
    return x, y


def shift(x: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Covariate shift: global gain + offset + mild noise — exactly what
    stale BN running statistics cannot absorb."""
    return (2.0 * x + 1.0 + 0.1 * rng.randn(*x.shape)).astype(np.float32)


def train_tiny(seed=0, steps=300, batch=64):
    model = TinyCls()
    rng = np.random.RandomState(seed)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 1)), train=True)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, bstats, opt, x, y):
        def loss_fn(p):
            (_, logits), upd = model.apply(
                {"params": p, "batch_stats": bstats}, x, train=True, mutable=["batch_stats"]
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return ce, upd["batch_stats"]

        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), new_bs, opt, loss

    for _ in range(steps):
        x, y = make_data(rng, batch)
        params, bstats, opt, loss = step(params, bstats, opt, jnp.asarray(x), jnp.asarray(y))
    return model, params, bstats


def accuracy(apply_fn, state, x, y) -> float:
    logits = apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats}, jnp.asarray(x), train=False
    )
    return float(np.mean(np.argmax(np.asarray(logits), -1) == y))


def softmax_cfg(tta: dict):
    return ConfigNode(
        {
            "task": {"seed": 0},
            "training": {"criterion": {"sigmoid": False, "softmax": True}},
            "tta": tta,
        }
    )


class TestClassifierTTA:
    def test_tent_recovers_accuracy_under_covariate_shift(self):
        model, params, bstats = train_tiny()
        apply_fn = classifier_logits_apply(model)
        state = TrainState.create(
            apply_fn=apply_fn, params=params, batch_stats=bstats, tx=optax.identity()
        )
        rng = np.random.RandomState(42)
        x_clean, y = make_data(rng, 128)
        clean_acc = accuracy(apply_fn, state, x_clean, y)
        assert clean_acc >= 0.95, f"source model failed to train ({clean_acc})"

        x_shift = shift(x_clean, rng)
        shifted_acc = accuracy(apply_fn, state, x_shift, y)
        assert shifted_acc <= clean_acc - 0.1, (
            f"shift too mild to test recovery (clean {clean_acc}, shifted {shifted_acc})"
        )

        # BN adopts test-batch statistics at (1 - momentum)=0.1 per forward,
        # so the running stats need O(1/0.1) steps to cross over: 4 steps
        # leaves accuracy at the shifted floor, 16 recovers fully (measured)
        cfg = softmax_cfg(
            {
                "method": "tent",
                "steps": 16,
                "lr": 1e-2,
                "optimizer": "sgd",
                "momentum": 0.9,
                "update": "norm",
                "episodic": False,
                "entropy_focus": "all",  # [B,C] logits — no dense dilution
            }
        )
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        adapted = adapt_fn(state, jnp.asarray(x_shift), x_shift.shape[0])
        adapted_acc = accuracy(apply_fn, adapted, x_shift, y)
        # BN statistic recompute alone fixes most of a gain/offset shift;
        # the affine entropy steps polish it
        assert adapted_acc >= shifted_acc + 0.1, (clean_acc, shifted_acc, adapted_acc)
        assert adapted_acc >= 0.9, (clean_acc, shifted_acc, adapted_acc)
        # running stats must have been recomputed from the test batch
        d = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(adapted.batch_stats),
                jax.tree_util.tree_leaves(state.batch_stats),
            )
        )
        assert d > 0.0

    @pytest.mark.parametrize("method", ["memo", "sar"])
    def test_other_methods_run_on_classifiers(self, method):
        model, params, bstats = train_tiny(steps=60)
        apply_fn = classifier_logits_apply(model)
        state = TrainState.create(
            apply_fn=apply_fn, params=params, batch_stats=bstats, tx=optax.identity()
        )
        rng = np.random.RandomState(7)
        x, y = make_data(rng, 32)
        x = shift(x, rng)
        tta = {
            "method": method,
            "steps": 2,
            "lr": 1e-3,
            "optimizer": "sgd",
            "momentum": 0.9,
            "update": "norm",
            "episodic": True,
            "entropy_focus": "all",
        }
        if method == "memo":
            # mirror flips of a 2D image are a legitimate view family here
            tta.update({"n_views": 2, "aug_noise": 0.05})
        cfg = softmax_cfg(tta)
        adapter = get_tta_method(method)(cfg.tta, config=cfg, mesh=None)
        adapted = adapter.make_adapt_fn(state)(state, jnp.asarray(x), x.shape[0])
        assert adapter.last_entropy is not None
        mask = norm_param_mask(state.params)
        for m, a, b in zip(
            jax.tree_util.tree_leaves(mask),
            jax.tree_util.tree_leaves(adapted.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            if not m:
                assert float(jnp.sum(jnp.abs(a - b))) == 0.0

    def test_registered_resnet18_drops_into_the_adapter(self):
        """The real backbone registry entry (BN resnet) adapts: only BN
        affines move, conv kernels frozen, running stats recomputed."""
        cfg_model = ConfigNode({"name": "resnet18", "num_classes": 4})
        model = get_model("resnet18").from_config(cfg_model)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        state = TrainState.create(
            apply_fn=classifier_logits_apply(model),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=optax.identity(),
        )
        cfg = softmax_cfg(
            {
                "method": "tent",
                "steps": 2,
                "lr": 1e-2,
                "optimizer": "sgd",
                "momentum": 0.9,
                "update": "norm",
                "episodic": True,
                "entropy_focus": "all",
            }
        )
        adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
        adapted = adapter.make_adapt_fn(state)(state, x, 2)
        mask = norm_param_mask(state.params)
        moved = unmoved = 0.0
        for m, a, b in zip(
            jax.tree_util.tree_leaves(mask),
            jax.tree_util.tree_leaves(adapted.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            d = float(jnp.sum(jnp.abs(a - b)))
            if m:
                moved += d
            else:
                unmoved += d
        assert moved > 1e-5
        assert unmoved == 0.0
        assert adapter.last_entropy is not None and np.isfinite(adapter.last_entropy)
