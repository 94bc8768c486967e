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
