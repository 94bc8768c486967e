"""Surface-distance metrics (HD95 / ASD / NSD) on device.

The reference computes HD95/ASD through MONAI, whose kernels run host-side
scipy distance transforms (reference: src/evaluation/seg_eval.py:226-236,
311-360) — a per-batch device->host volume round-trip. Here the whole
computation is jnp on the accelerator:

  1. surface extraction = mask & ~erode(mask) with a 6-connected cross
     element and zero border (scipy/MONAI convention)
  2. EXACT anisotropic squared euclidean distance transform via three
     separable min-plus passes: along each axis,
     ``g[i] = min_j (f[j] + ((i-j)*spacing)^2)``. The O(n^2)-per-line
     min-plus is evaluated as a chunked broadcast-min — arithmetic the VPU
     eats for breakfast, with memory bounded by the chunk size (the classic
     O(n) lower-envelope algorithm is data-dependent and does not vectorize
     on TPU).
  3. directed distances gathered at the other mask's surface voxels;
     HD95 = max of the two directed 95th percentiles (numpy-style linear
     interpolation, matching np.percentile used by MONAI); ASD = mean of
     pred->gt distances (symmetric: both directions pooled); NSD
     (normalized surface Dice at tolerance tau, Nikolov et al. 2018 — the
     nnU-Net-era boundary metric) = the fraction of surface voxels, pooled
     over both surfaces, whose distance to the OTHER surface is <= tau.

Empty masks produce +inf (NSD: one-sided empty -> 0, both empty -> +inf),
which the evaluation layer replaces with the volume-diagonal penalty
(NSD: 0) per reference semantics, seg_eval.py:347-360.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.inf


def extract_surface(mask: jnp.ndarray) -> jnp.ndarray:
    """mask: [D,H,W] {0,1}. Surface = fg voxels with a bg 6-neighbor
    (border counts as bg, matching binary_erosion's border_value=0)."""
    m = mask > 0.5

    def shift(arr, ax, delta):
        pad = [(0, 0)] * arr.ndim
        if delta > 0:
            pad[ax] = (1, 0)
            sl = [slice(None)] * arr.ndim
            sl[ax] = slice(0, arr.shape[ax])
            return jnp.pad(arr, pad, constant_values=False)[tuple(sl)]
        pad[ax] = (0, 1)
        sl = [slice(None)] * arr.ndim
        sl[ax] = slice(1, arr.shape[ax] + 1)
        return jnp.pad(arr, pad, constant_values=False)[tuple(sl)]

    eroded = m
    for ax in range(3):
        eroded = eroded & shift(m, ax, 1) & shift(m, ax, -1)
    return m & ~eroded


def _minplus_lastaxis(f: jnp.ndarray, spacing: float, chunk: int = 256) -> jnp.ndarray:
    """1-D sampled-function squared-distance transform along the LAST axis.

    f: [..., n] squared-distance estimates; returns
    g[..., i] = min_j f[..., j] + ((i-j)*spacing)^2.

    On TPU the O(n^2) min-add runs as a VMEM-tiled Pallas kernel
    (pallas/edt_minplus.py); elsewhere rows are processed in chunks of
    ``chunk`` to bound the broadcast temporaries.
    """
    n = f.shape[-1]
    f2 = f.reshape(-1, n)
    i = jnp.arange(n, dtype=f.dtype)
    cost = ((i[None, :] - i[:, None]) * spacing) ** 2  # [j, i]

    from ..pallas.edt_minplus import minplus_pallas, tpu_available

    if tpu_available():
        out2 = minplus_pallas(f2, cost)
        return out2.reshape(f.shape)

    n_rows = f2.shape[0]
    pad_rows = (-n_rows) % chunk
    f2p = jnp.pad(f2, ((0, pad_rows), (0, 0)), constant_values=_INF)
    blocks = f2p.reshape(-1, chunk, n)

    def one_block(fb):
        # fb: [chunk, n(j)] -> [chunk, n(i)]
        return jnp.min(fb[:, :, None] + cost[None, :, :], axis=1)

    out = jax.lax.map(one_block, blocks)
    return out.reshape(-1, n)[:n_rows].reshape(f.shape)


def squared_edt(points: jnp.ndarray, spacing: Tuple[float, float, float]) -> jnp.ndarray:
    """Exact anisotropic squared EDT to the True voxels of ``points`` [D,H,W].

    All-False input yields +inf everywhere.
    """
    f = jnp.where(points > 0.5, 0.0, _INF).astype(jnp.float32)
    for ax in range(3):
        f = jnp.moveaxis(f, ax, -1)
        f = _minplus_lastaxis(f, float(spacing[ax]))
        f = jnp.moveaxis(f, -1, ax)
    return f


def _masked_percentile(values: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.percentile(values[mask], q) with linear interpolation; +inf when the
    mask is empty. values/mask are flat arrays of equal length."""
    big = jnp.asarray(_INF, values.dtype)
    v = jnp.where(mask, values, big)
    v = jnp.sort(v)
    k = jnp.sum(mask)

    def empty():
        return big

    def nonempty():
        pos = (k.astype(values.dtype) - 1.0) * (q / 100.0)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.ceil(pos).astype(jnp.int32)
        vlo = v[lo]
        vhi = v[hi]
        w = pos - lo.astype(values.dtype)
        return vlo * (1.0 - w) + vhi * w

    return jax.lax.cond(k > 0, nonempty, empty)


def surface_metrics_single(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    spacing: Tuple[float, float, float],
    *,
    percentile: float = 95.0,
    symmetric_asd: bool = False,
    nsd_tol=None,
):
    """HD95 and ASD (and optionally NSD) for one region pair pred/gt
    [D,H,W] {0,1}.

    Returns (hd95, asd) scalars, +inf when either surface is empty. With
    ``nsd_tol`` (a tolerance in the same physical units as ``spacing``,
    scalar or traced) returns (hd95, asd, nsd) where

        nsd = (|{p in S_pred : d(p, S_gt) <= tol}| +
               |{g in S_gt  : d(g, S_pred) <= tol}|) / (|S_pred| + |S_gt|)

    — Nikolov et al. 2018 / MONAI ``compute_surface_dice`` semantics: one
    empty surface gives 0 (the infinite distance field counts no voxel as
    within tolerance), both empty gives +inf for the host layer to
    sanitize. The NSD reuses the two distance fields HD95/ASD already
    computed, so it is near-free on top of them.
    """
    s_pred = extract_surface(pred)
    s_gt = extract_surface(gt)

    d_to_gt = jnp.sqrt(squared_edt(s_gt, spacing))  # distance field to gt surface
    d_to_pred = jnp.sqrt(squared_edt(s_pred, spacing))

    sp = s_pred.reshape(-1)
    sg = s_gt.reshape(-1)
    d1 = d_to_gt.reshape(-1)  # at pred-surface voxels: pred->gt distances
    d2 = d_to_pred.reshape(-1)  # at gt-surface voxels: gt->pred distances

    hd_a = _masked_percentile(d1, sp, percentile)
    hd_b = _masked_percentile(d2, sg, percentile)
    hd95 = jnp.maximum(hd_a, hd_b)

    n1 = jnp.sum(sp)
    n2 = jnp.sum(sg)
    sum1 = jnp.sum(jnp.where(sp, d1, 0.0))
    sum2 = jnp.sum(jnp.where(sg, d2, 0.0))
    if symmetric_asd:
        asd = jnp.where(n1 + n2 > 0, (sum1 + sum2) / jnp.maximum(n1 + n2, 1), _INF)
    else:
        asd = jnp.where(n1 > 0, sum1 / jnp.maximum(n1, 1), _INF)
    # any empty surface on a referenced side -> inf (host applies penalties)
    hd95 = jnp.where((n1 > 0) & (n2 > 0), hd95, _INF)
    asd = jnp.where((n2 > 0), asd, _INF)
    if nsd_tol is None:
        return hd95, asd

    tol = jnp.asarray(nsd_tol, d1.dtype)
    hits = jnp.sum(jnp.where(sp, (d1 <= tol).astype(d1.dtype), 0.0)) + jnp.sum(
        jnp.where(sg, (d2 <= tol).astype(d2.dtype), 0.0)
    )
    nsd = jnp.where(n1 + n2 > 0, hits / jnp.maximum(n1 + n2, 1), _INF)
    return hd95, asd, nsd


def batched_surface_metrics(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    *,
    spacing: Tuple[float, float, float],
    percentile: float = 95.0,
    symmetric_asd: bool = False,
    nsd_tol=None,
):
    """pred/gt: [B, D, H, W, R] {0,1} -> (hd95 [B,R], asd [B,R]).

    With ``nsd_tol`` (scalar, or per-region sequence of length R) also
    returns nsd [B,R]. Region/batch pairs are processed sequentially with
    lax.map (each EDT is itself heavily vectorized), bounding peak memory
    to one volume's transform at a time.
    """
    b, r = pred.shape[0], pred.shape[-1]
    pr = jnp.moveaxis(pred, -1, 1).reshape((b * r,) + pred.shape[1:4])
    gr = jnp.moveaxis(gt, -1, 1).reshape((b * r,) + gt.shape[1:4])

    fn = partial(
        surface_metrics_single,
        spacing=spacing,
        percentile=percentile,
        symmetric_asd=symmetric_asd,
    )
    if nsd_tol is None:
        hd, asd = jax.lax.map(lambda ab: fn(ab[0], ab[1]), (pr, gr))
        return hd.reshape(b, r), asd.reshape(b, r)

    tol_r = jnp.broadcast_to(jnp.asarray(nsd_tol, jnp.float32).reshape(-1), (r,))
    tol_pair = jnp.tile(tol_r, b)  # pair index = i*r + region
    hd, asd, nsd = jax.lax.map(
        lambda abt: fn(abt[0], abt[1], nsd_tol=abt[2]), (pr, gr, tol_pair)
    )
    return hd.reshape(b, r), asd.reshape(b, r), nsd.reshape(b, r)
