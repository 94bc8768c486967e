import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_tta_tpu.ops.seg_metrics import binary_dice_iou, dice_iou_from_logits
from multimodal_tta_tpu.ops.intensity import make_intensity_normalizer, zscore_masked


class TestDiceIoU:
    def test_perfect(self):
        g = (np.random.RandomState(0).rand(2, 4, 4, 4, 3) > 0.5).astype(np.float32)
        dice, iou, valid = binary_dice_iou(jnp.asarray(g), jnp.asarray(g))
        assert np.allclose(np.asarray(dice), 1.0, atol=1e-4)
        assert np.allclose(np.asarray(iou), 1.0, atol=1e-4)

    def test_empty_gt_invalid(self):
        p = np.ones((1, 8, 1), np.float32)
        g = np.zeros((1, 8, 1), np.float32)
        _, _, valid = binary_dice_iou(jnp.asarray(p), jnp.asarray(g))
        assert not bool(np.asarray(valid)[0, 0])

    def test_hand_values(self):
        # pred {1,1,0,0}, gt {1,0,1,0}: inter=1, psum=2, gsum=2
        p = np.array([1, 1, 0, 0], np.float32).reshape(1, 4, 1)
        g = np.array([1, 0, 1, 0], np.float32).reshape(1, 4, 1)
        dice, iou, valid = binary_dice_iou(jnp.asarray(p), jnp.asarray(g))
        assert float(dice[0, 0]) == pytest.approx(2 * 1 / 4, abs=1e-4)
        assert float(iou[0, 0]) == pytest.approx(1 / 3, abs=1e-4)
        assert bool(valid[0, 0])

    def test_from_logits_threshold(self):
        logits = np.full((1, 4, 1), -1.0, np.float32)  # sigmoid ~0.269
        gt = np.ones((1, 4, 1), np.float32)
        # threshold 0.5: pred empty
        d5, _, v5, pe5 = dice_iou_from_logits(jnp.asarray(logits), jnp.asarray(gt), 0.5)
        assert bool(pe5[0, 0]) and float(d5[0, 0]) < 0.01
        # threshold 0.2: pred full
        d2, _, _, pe2 = dice_iou_from_logits(jnp.asarray(logits), jnp.asarray(gt), 0.2)
        assert not bool(pe2[0, 0]) and float(d2[0, 0]) > 0.99


class TestIntensity:
    def test_zscore_masked_matches_numpy(self):
        rng = np.random.RandomState(1)
        x = rng.randn(6, 6, 6).astype(np.float32) * 100
        x[x < 0] = -1000.0  # background
        got = np.asarray(zscore_masked(jnp.asarray(x), mask_gt=-900.0))
        vals = x[x > -900.0]
        mu, sd = vals.mean(), vals.std()
        want = (x - mu) / max(sd, 1e-6)
        assert np.allclose(got, want, atol=1e-3)

    def test_zscore_fallback_small_mask(self):
        x = np.full((4, 4, 4), -1000.0, np.float32)
        x[0, 0, 0] = 5.0  # only one voxel above threshold -> fallback to all
        got = np.asarray(zscore_masked(jnp.asarray(x), mask_gt=-900.0, min_count=16))
        mu, sd = x.mean(), x.std()
        want = (x - mu) / max(sd, 1e-6)
        assert np.allclose(got, want, atol=1e-3)

    def test_policy_ct_pt(self):
        policy = {
            "enabled": True,
            "channel_names": ["ct", "pt"],
            "channels": {
                "ct": {"clip": [-1000, 1000], "zscore": {"masked": True, "mask_gt": -900, "eps": 1e-6}},
                "pt": {"clip": [0.0, 15.0], "zscore": {"masked": True, "mask_gt": 0.0, "eps": 1e-6}},
            },
        }
        f = make_intensity_normalizer(normalize=True, intensity_policy=policy)
        rng = np.random.RandomState(2)
        ct = rng.randn(8, 8, 8).astype(np.float32) * 500
        pt = np.abs(rng.randn(8, 8, 8)).astype(np.float32) * 5
        x = np.stack([ct, pt], axis=-1)
        out = np.asarray(f(jnp.asarray(x)))
        assert out.shape == x.shape
        # CT stats over clipped & masked voxels should be ~N(0,1)
        ct_clip = np.clip(ct, -1000, 1000)
        m = ct_clip > -900
        assert abs(out[..., 0][m].mean()) < 0.05
        assert np.isfinite(out).all()

    def test_legacy_meanstd(self):
        f = make_intensity_normalizer(normalize=True, mean=[1.0, 2.0], std=[2.0, 4.0])
        x = np.ones((4, 4, 4, 2), np.float32)
        out = np.asarray(f(jnp.asarray(x)))
        assert np.allclose(out[..., 0], 0.0)
        assert np.allclose(out[..., 1], -0.25)

    def test_disabled_identity(self):
        f = make_intensity_normalizer(normalize=False)
        x = jnp.ones((2, 2, 2, 1))
        assert f(x) is x

    def test_jittable(self):
        import jax

        policy = {
            "enabled": True,
            "channel_names": ["ct"],
            "channels": {"ct": {"clip": [-10, 10], "zscore": {"masked": False}}},
        }
        f = jax.jit(make_intensity_normalizer(normalize=True, intensity_policy=policy))
        x = jnp.asarray(np.random.RandomState(3).randn(4, 4, 4, 1).astype(np.float32))
        out = f(x)
        assert np.isfinite(np.asarray(out)).all()
