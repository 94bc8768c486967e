import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.ops.losses import (
    dice_ce_loss,
    soft_dice_loss,
    binary_cross_entropy_with_logits,
    softmax_cross_entropy,
    entropy_loss,
    focal_loss,
    make_dice_ce_loss,
)
from multimodal_tta_tpu.conf import ConfigNode


def rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestBCE:
    def test_matches_torch(self):
        import torch

        logits = rand((2, 4, 4, 4, 3), 1)
        target = (rand((2, 4, 4, 4, 3), 2) > 0).astype(np.float32)
        got = float(binary_cross_entropy_with_logits(jnp.asarray(logits), jnp.asarray(target)))
        want = float(
            torch.nn.functional.binary_cross_entropy_with_logits(
                torch.tensor(logits), torch.tensor(target)
            )
        )
        assert got == pytest.approx(want, rel=1e-5)

    def test_pos_weight_matches_torch(self):
        import torch

        logits = rand((2, 8, 1), 3)
        target = (rand((2, 8, 1), 4) > 0).astype(np.float32)
        w = np.array([50.0], dtype=np.float32)
        got = float(
            binary_cross_entropy_with_logits(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(w))
        )
        want = float(
            torch.nn.functional.binary_cross_entropy_with_logits(
                torch.tensor(logits), torch.tensor(target), pos_weight=torch.tensor(w)
            )
        )
        assert got == pytest.approx(want, rel=1e-5)


class TestCE:
    def test_matches_torch(self):
        import torch

        logits = rand((2, 16, 4), 5)
        tgt = np.random.RandomState(6).randint(0, 4, size=(2, 16))
        got = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(tgt)))
        want = float(
            torch.nn.functional.cross_entropy(
                torch.tensor(logits).permute(0, 2, 1), torch.tensor(tgt)
            )
        )
        assert got == pytest.approx(want, rel=1e-5)

    def test_weighted_matches_torch(self):
        import torch

        logits = rand((3, 10, 5), 7)
        tgt = np.random.RandomState(8).randint(0, 5, size=(3, 10))
        w = np.array([1.0, 2.0, 0.5, 3.0, 1.5], dtype=np.float32)
        got = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(tgt), jnp.asarray(w)))
        want = float(
            torch.nn.functional.cross_entropy(
                torch.tensor(logits).permute(0, 2, 1), torch.tensor(tgt), weight=torch.tensor(w)
            )
        )
        assert got == pytest.approx(want, rel=1e-5)


class TestDice:
    def test_perfect_prediction_near_zero(self):
        t = (rand((1, 8, 8, 8, 2), 9) > 0).astype(np.float32)
        loss = float(soft_dice_loss(jnp.asarray(t), jnp.asarray(t)))
        assert loss < 1e-4

    def test_disjoint_prediction_near_one(self):
        p = np.zeros((1, 4, 4, 4, 1), np.float32)
        g = np.zeros_like(p)
        p[0, :2] = 1.0
        g[0, 2:] = 1.0
        loss = float(soft_dice_loss(jnp.asarray(p), jnp.asarray(g)))
        assert loss > 0.99

    def test_hand_computed(self):
        # pred=[1,1,0,0], gt=[1,0,0,0]: dice = (2*1+s)/(2+1+s)
        p = np.array([1, 1, 0, 0], np.float32).reshape(1, 4, 1)
        g = np.array([1, 0, 0, 0], np.float32).reshape(1, 4, 1)
        s = 1e-5
        want = 1 - (2 * 1 + s) / (3 + s)
        got = float(soft_dice_loss(jnp.asarray(p), jnp.asarray(g)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_include_background_false_drops_ch0(self):
        p = rand((1, 8, 3), 10)
        g = (rand((1, 8, 3), 11) > 0).astype(np.float32)
        full = float(soft_dice_loss(jax.nn.sigmoid(jnp.asarray(p)), jnp.asarray(g), include_background=False))
        fg_only = float(
            soft_dice_loss(jax.nn.sigmoid(jnp.asarray(p[..., 1:])), jnp.asarray(g[..., 1:]))
        )
        assert full == pytest.approx(fg_only, rel=1e-6)

    def test_jaccard_denominator(self):
        p = np.array([1, 1, 0, 0], np.float32).reshape(1, 4, 1)
        g = np.array([1, 0, 0, 0], np.float32).reshape(1, 4, 1)
        s = 1e-5
        # jaccard denom = 2*(p+g) - 2*inter = 2*3-2*1 = 4
        want = 1 - (2 * 1 + s) / (4 + s)
        got = float(soft_dice_loss(jnp.asarray(p), jnp.asarray(g), jaccard=True))
        assert got == pytest.approx(want, rel=1e-5)


class TestDiceCE:
    def test_lambda_combination(self):
        logits = jnp.asarray(rand((2, 16, 1), 12))
        target = jnp.asarray((rand((2, 16, 1), 13) > 0).astype(np.float32))
        l_d = dice_ce_loss(logits, target, lambda_dice=1.0, lambda_ce=0.0)
        l_c = dice_ce_loss(logits, target, lambda_dice=0.0, lambda_ce=1.0)
        l_both = dice_ce_loss(logits, target, lambda_dice=5.0, lambda_ce=1.0)
        assert float(l_both) == pytest.approx(5 * float(l_d) + float(l_c), rel=1e-5)

    def test_from_config(self):
        cfg = ConfigNode(
            {
                "sigmoid": True,
                "include_background": False,
                "lambda_dice": 5.0,
                "lambda_ce": 1.0,
                "ce_weight": [50.0],
            }
        )
        fn = make_dice_ce_loss(cfg)
        logits = jnp.asarray(rand((2, 8, 1), 14))
        target = jnp.asarray((rand((2, 8, 1), 15) > 0).astype(np.float32))
        v = float(fn(logits, target))
        assert np.isfinite(v) and v > 0

    def test_invalid_config_raises(self):
        with pytest.raises(ValueError):
            make_dice_ce_loss(ConfigNode({"sigmoid": True, "softmax": True}))
        with pytest.raises(ValueError):
            make_dice_ce_loss(ConfigNode({"sigmoid": False, "softmax": False}))

    def test_softmax_mode_with_int_target(self):
        logits = jnp.asarray(rand((2, 16, 4), 16))
        tgt = jnp.asarray(np.random.RandomState(17).randint(0, 4, size=(2, 16)))
        v = float(dice_ce_loss(logits, tgt, sigmoid=False, softmax=True, to_onehot_y=True))
        assert np.isfinite(v)

    def test_grad_flows(self):
        logits = jnp.asarray(rand((1, 8, 1), 18))
        target = jnp.asarray((rand((1, 8, 1), 19) > 0).astype(np.float32))
        g = jax.grad(lambda l: dice_ce_loss(l, target))(logits)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.sum(jnp.abs(g))) > 0


class TestEntropyFocal:
    def test_entropy_max_at_zero_logits(self):
        z = jnp.zeros((1, 8, 2))
        h0 = float(entropy_loss(z))
        assert h0 == pytest.approx(np.log(2), rel=1e-5)
        confident = jnp.full((1, 8, 2), 20.0)
        assert float(entropy_loss(confident)) < 1e-6

    def test_entropy_softmax(self):
        z = jnp.zeros((1, 8, 4))
        assert float(entropy_loss(z, sigmoid=False)) == pytest.approx(np.log(4), rel=1e-5)

    def test_focal_reduces_easy_examples(self):
        easy = jnp.full((1, 8, 1), 10.0)
        t = jnp.ones((1, 8, 1))
        hard = jnp.full((1, 8, 1), -10.0)
        assert float(focal_loss(easy, t)) < float(focal_loss(hard, t))


class TestGWDL:
    """Generalized Wasserstein Dice Loss (softmax label-map formulation)."""

    @staticmethod
    def _loss(logits, label, M, **kw):
        from multimodal_tta_tpu.ops.losses import generalized_wasserstein_dice_loss

        return float(
            generalized_wasserstein_dice_loss(
                jnp.asarray(logits), jnp.asarray(label), M, **kw
            )
        )

    def test_uniform_metric_reduces_to_soft_dice(self):
        # with M = 1 - I the paper's formula collapses to foreground soft
        # Dice: 1 - 2*sum(p1*y) / (sum(p1) + sum(y)) — verified against an
        # independent numpy computation (smooth=0 for exactness)
        rng = np.random.RandomState(0)
        logits = rng.randn(2, 4, 4, 4, 2).astype(np.float32)
        label = (rng.rand(2, 4, 4, 4) > 0.6).astype(np.int32)
        M = [[0.0, 1.0], [1.0, 0.0]]
        got = self._loss(logits, label, M, smooth=0.0)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        p1 = (e / e.sum(-1, keepdims=True))[..., 1]
        inter = (p1 * label).reshape(2, -1).sum(-1)
        denom = p1.reshape(2, -1).sum(-1) + label.reshape(2, -1).sum(-1)
        expect = float(np.mean(1.0 - 2.0 * inter / denom))
        assert got == pytest.approx(expect, rel=1e-5)

    def test_tree_metric_grades_error_severity(self):
        # classes (bg, A, B) with d(A,B)=0.5 < d(A,bg)=1: for true-A voxels,
        # mass leaking to the semantically-close B costs less than the same
        # mass leaking to background
        M = [[0.0, 1.0, 1.0], [1.0, 0.0, 0.5], [1.0, 0.5, 0.0]]
        label = np.ones((1, 2, 2, 2), np.int32)  # all true class A
        near = np.zeros((1, 2, 2, 2, 3), np.float32)
        near[..., 1] = 1.0
        near[..., 2] = 0.8  # leak toward B
        far = np.zeros((1, 2, 2, 2, 3), np.float32)
        far[..., 1] = 1.0
        far[..., 0] = 0.8  # same leak toward background
        assert self._loss(near, label, M) < self._loss(far, label, M)

    def test_perfect_and_worst_bounds(self):
        M = [[0.0, 1.0], [1.0, 0.0]]
        label = np.array([[[[1, 0], [0, 1]]]], np.int32)  # [1,1,2,2]
        perfect = np.full(label.shape + (2,), -20.0, np.float32)
        for idx in np.ndindex(label.shape):
            perfect[idx + (label[idx],)] = 20.0
        assert self._loss(perfect, label, M) == pytest.approx(0.0, abs=1e-4)
        worst = np.full(label.shape + (2,), -20.0, np.float32)
        for idx in np.ndindex(label.shape):
            worst[idx + (1 - label[idx],)] = 20.0
        assert self._loss(worst, label, M) > 0.9

    def test_grad_finite_and_jittable(self):
        from multimodal_tta_tpu.ops.losses import generalized_wasserstein_dice_loss

        M = [[0.0, 1.0, 0.7], [1.0, 0.0, 0.5], [0.7, 0.5, 0.0]]
        logits = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 4, 3), jnp.float32)
        label = jnp.asarray(np.random.RandomState(2).randint(0, 3, (2, 4, 4, 4)))
        g = jax.jit(
            jax.grad(lambda lg: generalized_wasserstein_dice_loss(lg, label, M))
        )(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.sum(jnp.abs(g))) > 0.0

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="classes"):
            self._loss(np.zeros((1, 2, 2, 2, 3), np.float32), np.zeros((1, 2, 2, 2), np.int32),
                       [[0.0, 1.0], [1.0, 0.0]])
        with pytest.raises(ValueError, match="square"):
            self._loss(np.zeros((1, 2, 2, 2, 2), np.float32), np.zeros((1, 2, 2, 2), np.int32),
                       [[0.0, 1.0, 1.0], [1.0, 0.0, 1.0]])

    def test_ce_hybrid(self):
        """gwdl_ce_loss: lambda_ce=0 is EXACTLY pure GWDL; lambda_ce>0 is
        exactly gwdl + lambda*CE (with class weights respected)."""
        from multimodal_tta_tpu.ops.losses import (
            generalized_wasserstein_dice_loss,
            gwdl_ce_loss,
            softmax_cross_entropy,
        )

        M = [[0.0, 1.0, 1.0], [1.0, 0.0, 0.5], [1.0, 0.5, 0.0]]
        rs = np.random.RandomState(3)
        logits = jnp.asarray(rs.randn(2, 4, 4, 4, 3), jnp.float32)
        label = jnp.asarray(rs.randint(0, 3, (2, 4, 4, 4)), jnp.int32)
        pure = float(generalized_wasserstein_dice_loss(logits, label, M))
        assert float(gwdl_ce_loss(logits, label, distance_matrix=M)) == pure
        w = [1.0, 1.0, 4.0]
        got = float(
            gwdl_ce_loss(logits, label, distance_matrix=M, lambda_ce=0.5, ce_weight=w)
        )
        want = pure + 0.5 * float(
            softmax_cross_entropy(logits, label, class_weight=jnp.asarray(w))
        )
        assert got == pytest.approx(want, rel=1e-6)

    def test_ce_hybrid_via_criterion(self):
        from multimodal_tta_tpu.ops.losses import make_criterion

        cfg = ConfigNode(
            {
                "name": "gwdl",
                "softmax": True,
                "distance_matrix": [[0.0, 1.0], [1.0, 0.0]],
                "lambda_ce": 1.0,
                "ce_weight": [1.0, 2.0],
            }
        )
        fn = make_criterion(cfg)
        lg = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 4, 2), jnp.float32)
        lb = jnp.ones((1, 4, 4, 4), jnp.int32)
        base = make_criterion(
            ConfigNode(
                {"name": "gwdl", "softmax": True,
                 "distance_matrix": [[0.0, 1.0], [1.0, 0.0]]}
            )
        )
        assert float(fn(lg, lb)) > float(base(lg, lb))


class TestCriterionDispatch:
    def test_default_is_dice_ce(self):
        from multimodal_tta_tpu.ops.losses import make_criterion

        fn = make_criterion(ConfigNode({"sigmoid": True}))
        lg = jnp.zeros((1, 4, 4, 4, 1))
        lb = jnp.zeros((1, 4, 4, 4, 1))
        assert np.isfinite(float(fn(lg, lb)))

    def test_gwdl_dispatch_and_validation(self):
        from multimodal_tta_tpu.ops.losses import make_criterion

        cfg = ConfigNode(
            {
                "name": "gwdl",
                "softmax": True,
                "distance_matrix": [[0.0, 1.0], [1.0, 0.0]],
            }
        )
        fn = make_criterion(cfg)
        lg = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 4, 2), jnp.float32)
        lb = jnp.zeros((1, 4, 4, 4), jnp.int32)
        assert np.isfinite(float(fn(lg, lb)))
        with pytest.raises(ValueError, match="distance_matrix is required"):
            make_criterion(ConfigNode({"name": "gwdl", "softmax": True}))
        with pytest.raises(ValueError, match="softmax"):
            make_criterion(
                ConfigNode({"name": "gwdl", "sigmoid": True, "distance_matrix": [[0.0]]})
            )
        with pytest.raises(ValueError, match="zero diagonal"):
            make_criterion(
                ConfigNode(
                    {"name": "gwdl", "softmax": True,
                     "distance_matrix": [[0.1, 1.0], [1.0, 0.0]]}
                )
            )
        with pytest.raises(ValueError, match="unknown criterion"):
            make_criterion(ConfigNode({"name": "nope", "sigmoid": True}))
