"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_tta_tpu.pallas.edt_minplus import minplus_pallas


def oracle(f, cost):
    return np.min(f[:, :, None] + cost[None, :, :], axis=1)


class TestMinPlusKernel:
    @pytest.mark.parametrize("rows,n", [(10, 48), (300, 144), (256, 128), (1, 7)])
    def test_parity_random(self, rows, n):
        rng = np.random.RandomState(rows + n)
        f = np.where(rng.rand(rows, n) > 0.85, 0.0, np.inf).astype(np.float32)
        i = np.arange(n, dtype=np.float32)
        cost = ((i[None, :] - i[:, None]) * 1.5) ** 2
        got = np.asarray(minplus_pallas(jnp.asarray(f), jnp.asarray(cost), interpret=True))
        assert np.allclose(got, oracle(f, cost), equal_nan=True)

    def test_all_inf_rows(self):
        f = np.full((4, 16), np.inf, np.float32)
        i = np.arange(16, dtype=np.float32)
        cost = ((i[None, :] - i[:, None])) ** 2
        got = np.asarray(minplus_pallas(jnp.asarray(f), jnp.asarray(cost), interpret=True))
        assert np.all(np.isinf(got))

    def test_finite_function_values(self):
        """General sampled function (not just 0/inf point sets)."""
        rng = np.random.RandomState(9)
        f = (rng.rand(20, 32) * 50).astype(np.float32)
        i = np.arange(32, dtype=np.float32)
        cost = ((i[None, :] - i[:, None]) * 3.0) ** 2
        got = np.asarray(minplus_pallas(jnp.asarray(f), jnp.asarray(cost), interpret=True))
        assert np.allclose(got, oracle(f, cost), atol=1e-4)


class TestFusedInstanceNorm:
    """pallas/fused_instance_norm.py — the VERDICT-r4 lane-padding
    experiment kernel. Parity in interpret mode; the chip measurement and
    adopt/reject verdict live in scripts/bench_inorm_kernel.py +
    BASELINE.md."""

    def _case(self, shape, dtype):
        from multimodal_tta_tpu.pallas.fused_instance_norm import (
            fused_instance_norm,
            instance_norm_reference,
        )

        rng = np.random.RandomState(3)
        C = shape[-1]
        x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 3 + 1).astype(dtype)
        g = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
        out = fused_instance_norm(x, g, b, interpret=True)
        ref = instance_norm_reference(x, g, b)
        assert out.dtype == x.dtype
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=5e-5 if dtype == jnp.float32 else 5e-2,
        )

    @pytest.mark.parametrize("shape", [(2, 4, 12, 12, 32), (1, 3, 8, 8, 64),
                                       (2, 2, 6, 10, 16)])
    def test_parity_f32(self, shape):
        self._case(shape, jnp.float32)

    def test_parity_bf16(self):
        self._case((2, 4, 12, 12, 32), jnp.bfloat16)

    def test_no_act(self):
        from multimodal_tta_tpu.pallas.fused_instance_norm import (
            fused_instance_norm,
            instance_norm_reference,
        )

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 2, 8, 8, 32).astype(np.float32))
        g = jnp.ones((32,), jnp.float32)
        b = jnp.zeros((32,), jnp.float32)
        out = fused_instance_norm(x, g, b, act=None, interpret=True)
        ref = instance_norm_reference(x, g, b, act=None)
        assert float(jnp.min(out)) < 0  # relu really off
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
