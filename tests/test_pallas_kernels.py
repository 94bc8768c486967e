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
