"""Sliding-window 3D inference as one jitted scan.

The reference always runs whole-volume forwards (volumes are offline-resized
to fixed shapes; reference: src/evaluation/seg_eval.py:300 and SURVEY.md §5
"long-context" row). For volumes exceeding single-chip HBM, the BASELINE.json
north star names on-device sliding-window inference: this module provides it
TPU-natively —

  - window grid positions are computed statically from (volume, roi, overlap)
    so every slice is a static-shape ``dynamic_slice``
  - the window loop is a ``lax.scan`` over precomputed start coordinates:
    ONE compiled forward serves every window, logits accumulate into the
    output canvas with ``dynamic_update_slice``
  - overlap blending via a constant or gaussian importance map (MONAI's two
    modes), normalized at the end
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_starts(size: int, roi: int, overlap: float) -> list:
    """Start offsets covering [0, size) with windows of length roi and the
    given fractional overlap (MONAI dense-patch convention)."""
    if roi >= size:
        return [0]
    interval = max(1, int(roi * (1.0 - overlap)))
    n = int(math.ceil((size - roi) / interval)) + 1
    starts = [min(i * interval, size - roi) for i in range(n)]
    # dedupe while keeping order
    out = []
    for s in starts:
        if not out or s != out[-1]:
            out.append(s)
    return out


def gaussian_importance(roi: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """Gaussian window-importance map (MONAI's 'gaussian' blend mode)."""
    grids = []
    for r in roi:
        x = np.arange(r, dtype=np.float64)
        center = (r - 1) / 2.0
        sigma = max(r * sigma_scale, 1e-3)
        grids.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    w = grids[0][:, None, None] * grids[1][None, :, None] * grids[2][None, None, :]
    w = np.maximum(w, w.max() * 1e-3)  # avoid zero weights at corners
    return w.astype(np.float32)


def sliding_window_inference(
    apply_fn: Callable,
    volume: jnp.ndarray,
    roi_size: Tuple[int, int, int],
    *,
    num_classes: int,
    overlap: float = 0.25,
    mode: str = "gaussian",
) -> jnp.ndarray:
    """Run ``apply_fn(window [B,d,h,w,C]) -> logits [B,d,h,w,K]`` over a
    window grid of ``volume`` [B,D,H,W,C]; returns blended logits
    [B,D,H,W,K]. Fully jittable for fixed shapes.
    """
    b, D, H, W, c = volume.shape
    rd, rh, rw = (int(r) for r in roi_size)

    # pad volume up to at least the roi
    pad_d, pad_h, pad_w = max(0, rd - D), max(0, rh - H), max(0, rw - W)
    if pad_d or pad_h or pad_w:
        volume = jnp.pad(
            volume, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0))
        )
    Dp, Hp, Wp = D + pad_d, H + pad_h, W + pad_w

    starts = [
        (sd, sh, sw)
        for sd in window_starts(Dp, rd, overlap)
        for sh in window_starts(Hp, rh, overlap)
        for sw in window_starts(Wp, rw, overlap)
    ]
    starts_arr = jnp.asarray(starts, dtype=jnp.int32)  # [Nw, 3]

    if mode == "gaussian":
        imp = jnp.asarray(gaussian_importance((rd, rh, rw)))
    elif mode == "constant":
        imp = jnp.ones((rd, rh, rw), jnp.float32)
    else:
        raise ValueError(f"Unknown blend mode: {mode}")
    imp_k = imp[None, :, :, :, None]  # [1,d,h,w,1]

    out0 = jnp.zeros((b, Dp, Hp, Wp, num_classes), jnp.float32)
    wgt0 = jnp.zeros((1, Dp, Hp, Wp, 1), jnp.float32)

    def body(carry, start):
        out, wgt = carry
        sd, sh, sw = start[0], start[1], start[2]
        win = jax.lax.dynamic_slice(
            volume, (0, sd, sh, sw, 0), (b, rd, rh, rw, c)
        )
        logits = apply_fn(win).astype(jnp.float32)
        patch = jax.lax.dynamic_slice(out, (0, sd, sh, sw, 0), (b, rd, rh, rw, num_classes))
        out = jax.lax.dynamic_update_slice(out, patch + logits * imp_k, (0, sd, sh, sw, 0))
        wpatch = jax.lax.dynamic_slice(wgt, (0, sd, sh, sw, 0), (1, rd, rh, rw, 1))
        wgt = jax.lax.dynamic_update_slice(wgt, wpatch + imp_k, (0, sd, sh, sw, 0))
        return (out, wgt), None

    (out, wgt), _ = jax.lax.scan(body, (out0, wgt0), starts_arr)
    blended = out / jnp.maximum(wgt, 1e-8)
    return blended[:, :D, :H, :W, :]
