"""SSIM / MS-SSIM for 2D and 3D volumes (jnp).

Parity with the reference's vendored pytorch-msssim module (reference:
src/utils/ssim.py:58-330): separable gaussian filtering (win_size 11,
sigma 1.5 defaults), per-channel computation with channel-last layout,
data_range scaling, and the 5-scale MS-SSIM weights. 2D vs 3D is dispatched
on input rank exactly like the reference's conv2d/conv3d switch
(ssim.py:37-43).

Layout: [B, H, W, C] (2D) or [B, D, H, W, C] (3D).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel1d(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _filter_separable(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode separable gaussian blur over all spatial axes of
    [B, *spatial, C]."""
    n_spatial = x.ndim - 2
    k = kernel.shape[0]
    for ax in range(1, 1 + n_spatial):
        x = jnp.moveaxis(x, ax, -1)
        shape = x.shape
        flat = x.reshape(-1, 1, shape[-1])  # [N, 1, L] as NCW
        out = jax.lax.conv_general_dilated(
            flat,
            kernel.reshape(1, 1, k),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        x = out.reshape(shape[:-1] + (shape[-1] - k + 1,))
        x = jnp.moveaxis(x, -1, ax)
    return x


def _ssim_maps(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float,
    win_size: int,
    win_sigma: float,
    k1: float,
    k2: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel1d(win_size, win_sigma)

    mu_x = _filter_separable(x, kernel)
    mu_y = _filter_separable(y, kernel)
    mu_xx = _filter_separable(x * x, kernel)
    mu_yy = _filter_separable(y * y, kernel)
    mu_xy = _filter_separable(x * y, kernel)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    cs_map = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)) * cs_map
    return ssim_map, cs_map


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM over [B, *spatial, C] inputs (2D or 3D spatial)."""
    if x.shape != y.shape:
        raise ValueError(f"ssim shape mismatch: {x.shape} vs {y.shape}")
    if x.ndim not in (4, 5):
        raise ValueError(f"ssim expects [B,H,W,C] or [B,D,H,W,C], got ndim={x.ndim}")
    ssim_map, _ = _ssim_maps(
        x.astype(jnp.float32), y.astype(jnp.float32), data_range, win_size, win_sigma, k1, k2
    )
    axes = tuple(range(1, ssim_map.ndim))
    per_sample = jnp.mean(ssim_map, axis=axes)
    return jnp.mean(per_sample) if size_average else per_sample


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights: Optional[Sequence[float]] = None,
    k1: float = 0.01,
    k2: float = 0.03,
    size_average: bool = True,
) -> jnp.ndarray:
    """Multi-scale SSIM with 2x average-pool downsampling between scales."""
    if weights is None:
        weights = _MSSSIM_WEIGHTS
    weights_arr = jnp.asarray(weights, jnp.float32)
    n_scales = len(weights)

    min_side = min(x.shape[1:-1])
    need = (win_size + 1) * (2 ** (n_scales - 1))
    if min_side <= need - 2:
        raise ValueError(
            f"ms_ssim: smallest spatial side {min_side} too small for {n_scales} scales "
            f"with win_size {win_size} (needs > {need - 2})"
        )

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    n_spatial = x.ndim - 2
    window = (1,) + (2,) * n_spatial + (1,)

    mcs = []
    for i in range(n_scales):
        ssim_map, cs_map = _ssim_maps(x, y, data_range, win_size, win_sigma, k1, k2)
        axes = tuple(range(1, ssim_map.ndim))
        if i < n_scales - 1:
            mcs.append(jnp.maximum(jnp.mean(cs_map, axis=axes), 0.0))
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, window, "VALID") / (2 ** n_spatial)
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, window, window, "VALID") / (2 ** n_spatial)
        else:
            last = jnp.maximum(jnp.mean(ssim_map, axis=axes), 0.0)

    stacked = jnp.stack(mcs + [last], axis=0)  # [S, B]
    per_sample = jnp.prod(stacked ** weights_arr[:, None], axis=0)
    return jnp.mean(per_sample) if size_average else per_sample


class SSIM:
    """Callable wrapper mirroring the reference's SSIM module API."""

    def __init__(self, data_range: float = 1.0, size_average: bool = True, win_size: int = 11, win_sigma: float = 1.5):
        self.kw = dict(data_range=data_range, size_average=size_average, win_size=win_size, win_sigma=win_sigma)

    def __call__(self, x, y):
        return ssim(x, y, **self.kw)


class MS_SSIM:
    def __init__(self, data_range: float = 1.0, size_average: bool = True, win_size: int = 11, win_sigma: float = 1.5, weights=None):
        self.kw = dict(data_range=data_range, size_average=size_average, win_size=win_size, win_sigma=win_sigma, weights=weights)

    def __call__(self, x, y):
        return ms_ssim(x, y, **self.kw)
