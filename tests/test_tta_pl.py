"""Pseudo-label TTA (method "pl"): objective semantics + engine integration.

The PL baseline from the Tent paper (Lee 2013 self-training at test time):
CE against the model's own confident hard predictions. The engine is the
shared Tent machinery (tta/tent.py); only the objective differs
(ops/losses.py pseudo_label_loss). Reference: no TTA exists there
(SURVEY.md §0) — new capability."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.ops.losses import pseudo_label_loss
from multimodal_tta_tpu.registry import get_tta_method
from multimodal_tta_tpu.tta import norm_param_mask
from multimodal_tta_tpu.tta.pl import PseudoLabelAdapter

from tests.test_tta import full_cfg, make_state


def pl_cfg(**kw):
    base = {
        "method": "pl",
        "steps": 2,
        "lr": 1e-2,
        "optimizer": "sgd",
        "momentum": 0.9,
        "update": "norm",
        "episodic": True,
    }
    base.update(kw)
    return ConfigNode(base)


class TestPseudoLabelLoss:
    def test_abstains_below_confidence(self):
        """Unconfident logits -> zero loss AND zero gradient (the built-in
        abstention that distinguishes PL from entropy minimization)."""
        logits = jnp.full((1, 4, 4, 4, 1), 0.05)  # p ~ 0.51, conf ~ 0.51

        def f(lg):
            return pseudo_label_loss(lg, sigmoid=True, conf_threshold=0.9)

        loss, grad = jax.value_and_grad(f)(logits)
        assert float(loss) == 0.0
        assert float(jnp.max(jnp.abs(grad))) == 0.0

    def test_gradient_sharpens_confident_calls(self):
        """Confident voxels get pushed toward their own hard label: positive
        logits' gradients are negative (gradient DEscent raises them)."""
        logits = jnp.asarray([[3.0, -3.0, 0.1]])  # conf: .95, .95, .52

        def f(lg):
            return pseudo_label_loss(lg, sigmoid=True, conf_threshold=0.9)

        grad = jax.grad(f)(logits)
        assert float(grad[0, 0]) < 0  # descent increases the positive logit
        assert float(grad[0, 1]) > 0  # descent decreases the negative logit
        assert float(grad[0, 2]) == 0.0  # gated out

    def test_softmax_mode_targets_argmax(self):
        logits = jnp.asarray([[[4.0, 0.0, 0.0]]])  # conf ~ 0.96 on class 0

        def f(lg):
            return pseudo_label_loss(lg, sigmoid=False, conf_threshold=0.9)

        loss = f(logits)
        assert float(loss) > 0
        grad = jax.grad(f)(logits)
        # descent raises the argmax-class logit, lowers the others
        assert float(grad[0, 0, 0]) < 0
        assert float(grad[0, 0, 1]) > 0 and float(grad[0, 0, 2]) > 0

    def test_normalized_by_confident_count(self):
        """Doubling the volume at the same confidence leaves the loss scale
        unchanged (self-normalization)."""
        lg = jnp.full((1, 8, 8, 8, 1), 3.0)
        l1 = pseudo_label_loss(lg, sigmoid=True, conf_threshold=0.9)
        l2 = pseudo_label_loss(jnp.tile(lg, (2, 1, 1, 1, 1)), sigmoid=True, conf_threshold=0.9)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


class TestPseudoLabelAdapter:
    def test_registered(self):
        assert get_tta_method("pl") is PseudoLabelAdapter

    def test_loss_decreases_and_only_norm_changes(self):
        state = make_state()
        cfg = full_cfg(tta=pl_cfg(**{"pl": {"conf_threshold": 0.6}}))
        adapter = PseudoLabelAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)

        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 2), jnp.float32)

        def pl_of(st):
            lg = st.apply_fn({"params": st.params}, x, train=False)
            return float(pseudo_label_loss(lg, sigmoid=True, conf_threshold=0.6))

        before = pl_of(state)
        new_state = adapt_fn(state, x, 2)
        after = pl_of(new_state)
        assert after < before, f"PL loss did not decrease: {before} -> {after}"

        mask = norm_param_mask(state.params)
        changed, unchanged_ok = 0, True
        for (p0, pm, p1) in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(mask),
            jax.tree_util.tree_leaves(new_state.params),
        ):
            same = np.allclose(np.asarray(p0), np.asarray(p1))
            if pm:
                changed += 0 if same else 1
            else:
                unchanged_ok &= same
        assert changed > 0, "no norm params changed"
        assert unchanged_ok, "non-norm params changed under update=norm"

    def test_threshold_one_is_identity(self):
        """conf_threshold=1.0 gates every voxel out: adaptation is a no-op
        (max(p,1-p) < 1 for finite logits)."""
        state = make_state()
        cfg = full_cfg(tta=pl_cfg(**{"pl": {"conf_threshold": 1.0}}))
        adapter = PseudoLabelAdapter(cfg.tta, config=cfg, mesh=None)
        adapt_fn = adapter.make_adapt_fn(state)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 16, 2), jnp.float32)
        new_state = adapt_fn(state, x, 2)
        for p0, p1 in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(new_state.params),
        ):
            np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-7)

    def test_mislabel_guard(self):
        cfg = full_cfg(tta=pl_cfg(loss="entropy"))
        with pytest.raises(ValueError, match="mislabeled"):
            PseudoLabelAdapter(cfg.tta, config=cfg, mesh=None)

    def test_entropy_modes_untouched(self):
        """The tent objective path is unchanged by the pl plumbing: an
        entropy-mode adapter still rejects unknown modes and accepts the
        documented ones."""
        from multimodal_tta_tpu.tta import TentAdapter

        cfg = full_cfg(tta=ConfigNode({"method": "tent", "loss": "bogus"}))
        with pytest.raises(ValueError, match="unknown loss mode"):
            TentAdapter(cfg.tta, config=cfg, mesh=None)
        for mode in ("entropy", "entropy+consistency", "pl", "pl+consistency"):
            cfg = full_cfg(tta=ConfigNode({"method": "tent", "loss": mode}))
            TentAdapter(cfg.tta, config=cfg, mesh=None)
