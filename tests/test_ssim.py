import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_tta_tpu.ops.ssim import MS_SSIM, SSIM, ms_ssim, ssim


def img2d(seed=0, shape=(1, 64, 64, 1)):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def img3d(seed=0, shape=(1, 32, 32, 32, 1)):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


class TestSSIM:
    def test_identity_is_one(self):
        x = jnp.asarray(img2d())
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_identity_3d(self):
        x = jnp.asarray(img3d())
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_symmetry(self):
        x, y = jnp.asarray(img2d(1)), jnp.asarray(img2d(2))
        assert float(ssim(x, y)) == pytest.approx(float(ssim(y, x)), abs=1e-6)

    def test_noise_monotonicity(self):
        x = img2d(3)
        rng = np.random.RandomState(4)
        small = x + rng.randn(*x.shape).astype(np.float32) * 0.02
        big = x + rng.randn(*x.shape).astype(np.float32) * 0.2
        s_small = float(ssim(jnp.asarray(x), jnp.asarray(small)))
        s_big = float(ssim(jnp.asarray(x), jnp.asarray(big)))
        assert s_small > s_big > 0

    def test_matches_reference_formula_uniform_patch(self):
        """On constant images the SSIM formula reduces analytically."""
        x = jnp.full((1, 32, 32, 1), 0.5)
        y = jnp.full((1, 32, 32, 1), 0.7)
        c1 = (0.01 * 1.0) ** 2
        want = (2 * 0.5 * 0.7 + c1) / (0.5**2 + 0.7**2 + c1)
        assert float(ssim(x, y)) == pytest.approx(want, abs=1e-3)

    def test_size_average_false(self):
        x = jnp.asarray(img2d(5, (3, 64, 64, 2)))
        out = ssim(x, x, size_average=False)
        assert out.shape == (3,)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            ssim(jnp.zeros((1, 8, 8, 1)), jnp.zeros((1, 9, 8, 1)))


class TestMSSSIM:
    def test_identity_is_one(self):
        x = jnp.asarray(img2d(6, (1, 192, 192, 1)))
        assert float(ms_ssim(x, x)) == pytest.approx(1.0, abs=1e-4)

    def test_too_small_raises(self):
        x = jnp.zeros((1, 32, 32, 1))
        with pytest.raises(ValueError, match="too small"):
            ms_ssim(x, x)

    def test_degrades_with_noise(self):
        x = img2d(7, (1, 192, 192, 1))
        y = x + np.random.RandomState(8).randn(*x.shape).astype(np.float32) * 0.1
        v = float(ms_ssim(jnp.asarray(x), jnp.asarray(y)))
        assert 0 < v < 1

    def test_wrappers(self):
        x = jnp.asarray(img2d(9))
        assert float(SSIM()(x, x)) == pytest.approx(1.0, abs=1e-5)
        x_big = jnp.asarray(img2d(10, (1, 192, 192, 1)))
        assert float(MS_SSIM()(x_big, x_big)) == pytest.approx(1.0, abs=1e-4)
