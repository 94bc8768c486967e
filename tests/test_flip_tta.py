"""Flip-averaged test-time augmentation (ops/flip_tta.py +
evaluation.flip_tta): exact un-flip inverse, equivariance identity, and the
seg_eval wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.ops.flip_tta import flip_averaged_probs, flip_combos


class TestFlipCombos:
    def test_all_subsets_clean_first(self):
        combos = flip_combos([1, 2, 3])
        assert len(combos) == 8
        assert combos[0] == ()
        assert set(combos) == {
            (), (1,), (2,), (3,), (1, 2), (1, 3), (2, 3), (1, 2, 3)
        }

    def test_single_axis(self):
        assert flip_combos([2]) == ((), (2,))


class TestFlipAveragedProbs:
    def test_flip_invariant_fn_equals_clean(self):
        """A forward that ignores spatial content (constant logits) makes
        every flipped view identical — the average equals the clean probs."""
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 6, 8, 3), jnp.float32)
        const = jnp.asarray(np.random.RandomState(1).randn(1, 1, 1, 1, 2), jnp.float32)

        def forward(v):
            return jnp.broadcast_to(const, v.shape[:-1] + (2,))

        logits, prob = flip_averaged_probs(forward, x, (1, 2, 3), jax.nn.sigmoid)
        np.testing.assert_allclose(
            np.asarray(prob), np.asarray(jax.nn.sigmoid(logits)), atol=1e-6
        )

    def test_matches_manual_average(self):
        """Average over 2^k un-flipped views == the hand-rolled computation
        for a spatially-sensitive forward."""
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 4, 4, 4, 2), jnp.float32)
        w = jnp.asarray(rng.randn(2, 1), jnp.float32)
        ramp = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1, 1, 1)

        def forward(v):
            return v @ w + ramp  # position-dependent: flips matter

        axes = (1, 3)
        _, prob = flip_averaged_probs(forward, x, axes, jax.nn.sigmoid)
        acc = jnp.zeros_like(prob)
        for combo in [(), (1,), (3,), (1, 3)]:
            xv = jnp.flip(x, combo) if combo else x
            p = jax.nn.sigmoid(forward(xv))
            acc = acc + (jnp.flip(p, combo) if combo else p)
        np.testing.assert_allclose(np.asarray(prob), np.asarray(acc / 4), atol=1e-6)

    def test_equivariant_fn_average_is_flip_invariant(self):
        """For a pointwise (hence flip-equivariant) forward, every un-flipped
        view is identical, so the ensemble equals the clean view — the
        exact-inverse property that makes mirror TTA label-consistent."""
        x = jnp.asarray(np.random.RandomState(3).randn(1, 4, 4, 4, 2), jnp.float32)

        def forward(v):
            return v[..., :1] * 2.0 - 1.0

        logits, prob = flip_averaged_probs(forward, x, (1, 2, 3), jax.nn.sigmoid)
        np.testing.assert_allclose(
            np.asarray(prob), np.asarray(jax.nn.sigmoid(logits)), atol=1e-6
        )

    def test_jittable(self):
        x = jnp.asarray(np.random.RandomState(4).randn(1, 4, 4, 4, 1), jnp.float32)

        @jax.jit
        def run(v):
            return flip_averaged_probs(lambda y: y * 3.0, v, (1, 2), jax.nn.sigmoid)[1]

        assert run(x).shape == x.shape


class TestSegEvalFlipTTA:
    def _strategy_and_state(self, flip=True):
        import optax

        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.core.train_state import TrainState
        from multimodal_tta_tpu.evaluation.seg_eval import SegmentationEvaluationStrategy as SegEvalStrategy
        from multimodal_tta_tpu.models import UNet3D

        cfg = ConfigNode(
            {
                "task": {"seed": 0},
                "training": {"criterion": {"sigmoid": True}},
                "evaluation": {
                    "seg": {"region_order": ["gtvt"], "threshold": 0.5},
                    "flip_tta": {"enable": flip, "axes": [1, 2, 3]},
                    "loss": {"report_loss": True},
                },
            }
        )
        model = UNet3D(
            in_channels=1, num_classes=1, channels=(4, 8), strides=(2,),
            num_res_units=1, norm="INSTANCE",
        )
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)), train=True)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=optax.identity(),
        )
        return SegEvalStrategy(cfg), state

    def _loader(self):
        rng = np.random.RandomState(5)
        for _ in range(2):
            yield {
                "image": rng.randn(2, 8, 8, 8, 1).astype(np.float32),
                "label": (rng.rand(2, 8, 8, 8, 1) > 0.7).astype(np.float32),
                "domain": ["A", "A"],
            }

    def test_evaluate_epoch_schema_and_loss_is_clean_view(self):
        strat, state = self._strategy_and_state(flip=True)
        metrics = strat.evaluate_epoch(state, self._loader(), mesh=None)
        assert "gtvt_dc" in metrics and "avg_dc" in metrics
        # the reported loss comes from the clean forward: identical to the
        # flip-disabled strategy's loss on the same stream
        plain, state2 = self._strategy_and_state(flip=False)
        ref = plain.evaluate_epoch(state, self._loader(), mesh=None)
        np.testing.assert_allclose(metrics["loss"], ref["loss"], atol=1e-5)

    def test_bad_axes_raise(self):
        import pytest

        from multimodal_tta_tpu.conf import ConfigNode
        from multimodal_tta_tpu.evaluation.seg_eval import SegmentationEvaluationStrategy as SegEvalStrategy

        cfg = ConfigNode(
            {"evaluation": {"flip_tta": {"enable": True, "axes": [0, 1]}}}
        )
        with pytest.raises(ValueError, match="spatial"):
            SegEvalStrategy(cfg)


class TestFlipEnsembleVariance:
    def test_variance_mean_matches_plain_and_is_zero_for_invariant_fn(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 6, 8, 3), jnp.float32)
        const = jnp.asarray(np.random.RandomState(1).randn(1, 1, 1, 1, 2), jnp.float32)

        def forward(v):
            return jnp.broadcast_to(const, v.shape[:-1] + (2,))

        _, mean2 = flip_averaged_probs(forward, x, (1, 2), jax.nn.sigmoid)
        _, mean3, var = flip_averaged_probs(
            forward, x, (1, 2), jax.nn.sigmoid, with_variance=True
        )
        np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean3), atol=1e-7)
        # spatially-constant logits: every view identical -> zero disagreement
        np.testing.assert_allclose(np.asarray(var), 0.0, atol=1e-7)

    def test_variance_matches_manual_population_variance(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 4, 4, 4, 2), jnp.float32)
        w = jnp.asarray(rng.randn(2, 1), jnp.float32)
        ramp = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1, 1, 1)

        def forward(v):
            return v @ w + ramp  # position-dependent: flips disagree

        axes = (1, 3)
        _, mean, var = flip_averaged_probs(
            forward, x, axes, jax.nn.sigmoid, with_variance=True
        )
        views = []
        for combo in [(), (1,), (3,), (1, 3)]:
            xv = jnp.flip(x, combo) if combo else x
            p = jax.nn.sigmoid(forward(xv))
            views.append(np.asarray(jnp.flip(p, combo) if combo else p))
        stack = np.stack(views)
        np.testing.assert_allclose(np.asarray(mean), stack.mean(0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(var), stack.var(0), atol=1e-6)
        assert float(np.asarray(var).max()) > 1e-6  # flips genuinely disagree
