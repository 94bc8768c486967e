import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.ops.sliding_window import (
    gaussian_importance,
    sliding_window_inference,
    window_starts,
)


class TestWindowStarts:
    def test_covers_whole_axis(self):
        for size, roi, ov in [(100, 32, 0.25), (48, 48, 0.5), (50, 32, 0.0), (33, 32, 0.25)]:
            starts = window_starts(size, roi, ov)
            assert starts[0] == 0
            assert starts[-1] == max(0, size - roi)
            covered = np.zeros(size, bool)
            for s in starts:
                covered[s : s + roi] = True
            assert covered.all()

    def test_roi_larger_than_size(self):
        assert window_starts(16, 32, 0.25) == [0]


class TestGaussianImportance:
    def test_peak_at_center(self):
        w = gaussian_importance((9, 9, 9))
        assert w[4, 4, 4] == w.max()
        assert (w > 0).all()


class TestSlidingWindow:
    def test_identity_fn_reconstructs_input(self):
        """apply_fn = identity on channels: blended output == input for any
        overlap/blend mode (weights cancel)."""
        rng = np.random.RandomState(0)
        vol = jnp.asarray(rng.randn(1, 24, 20, 16, 2).astype(np.float32))
        for mode in ("constant", "gaussian"):
            out = sliding_window_inference(
                lambda w: w, vol, (8, 8, 8), num_classes=2, overlap=0.5, mode=mode
            )
            assert out.shape == vol.shape
            assert np.allclose(np.asarray(out), np.asarray(vol), atol=1e-4)

    def test_volume_smaller_than_roi(self):
        vol = jnp.asarray(np.random.RandomState(1).randn(1, 6, 6, 6, 1).astype(np.float32))
        out = sliding_window_inference(lambda w: w * 2, vol, (8, 8, 8), num_classes=1)
        assert out.shape == vol.shape
        assert np.allclose(np.asarray(out), 2 * np.asarray(vol), atol=1e-4)

    def test_jittable(self):
        vol = jnp.zeros((1, 16, 16, 16, 1))
        f = jax.jit(
            lambda v: sliding_window_inference(
                lambda w: w + 1, v, (8, 8, 8), num_classes=1, overlap=0.25
            )
        )
        out = f(vol)
        assert np.allclose(np.asarray(out), 1.0, atol=1e-5)

    def test_matches_direct_forward_with_unet(self, rng_key):
        """For a volume exactly one window big, SW == direct forward."""
        from multimodal_tta_tpu.models import UNet3D

        m = UNet3D(
            in_channels=1, num_classes=2, channels=(2, 4, 8, 16, 32), strides=(2, 2, 2, 2),
            num_res_units=1,
        )
        x = jnp.asarray(np.random.RandomState(2).randn(1, 16, 16, 16, 1).astype(np.float32))
        v = m.init(rng_key, x)
        direct = m.apply(v, x)
        sw = sliding_window_inference(
            lambda w: m.apply(v, w), x, (16, 16, 16), num_classes=2
        )
        assert np.allclose(np.asarray(sw), np.asarray(direct), atol=1e-4)

    def test_overlap_blending_smooth(self):
        """A fn with position-dependent output must still blend into values
        within the per-window output range."""
        vol = jnp.ones((1, 16, 16, 16, 1))

        def fn(w):
            return w * jnp.mean(w)  # constant within window

        out = sliding_window_inference(fn, vol, (8, 8, 8), num_classes=1, overlap=0.5)
        assert float(jnp.min(out)) >= 0.99 and float(jnp.max(out)) <= 1.01
