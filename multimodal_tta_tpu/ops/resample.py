"""Physical-space 3D resampling (the SimpleITK replacement).

The reference's offline pipeline leans on SimpleITK's C++ resampler
(reference: scripts/prepare_hecktor21.py:79-120) — not available here, and a
Python loop would be the preprocessing hot spot (SURVEY.md §2.3 item 1). This
module reimplements the needed subset as XLA gather kernels:

  - ``Grid``: ITK-style image geometry (origin, spacing, direction, size) in
    ITK's LPS physical convention, constructible from a NIfTI RAS affine —
    so bbox CSVs authored against ITK physical coordinates (the reference's
    input contract) are interpreted identically
  - ``resample_to_spacing``: regrid to a target spacing preserving
    origin/direction/FOV (reference:96-120 semantics, size = round(old_size *
    old_spacing / new_spacing))
  - ``resample_to_reference``: identity-transform regrid of a moving image
    onto a reference grid (reference:79-93)
  - trilinear and nearest interpolation with a default value outside the
    moving image's FOV, pixel-center aligned like ITK

The interpolation core is a jitted jnp function: 8-corner gathers + lerp,
fully vectorized (runs on TPU when available, XLA:CPU otherwise).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Sequence, Tuple

import numpy as np

_RAS2LPS = np.diag([-1.0, -1.0, 1.0])


@dataclass(frozen=True)
class Grid:
    """ITK-style image geometry in LPS space. Array layout is (X, Y, Z)."""

    origin: np.ndarray  # (3,)
    spacing: np.ndarray  # (3,)
    direction: np.ndarray  # (3,3) unit column vectors
    size: Tuple[int, int, int]

    @classmethod
    def from_ras_affine(cls, affine: np.ndarray, size: Sequence[int]) -> "Grid":
        """Build from a NIfTI RAS affine (our nifti reader's convention)."""
        A = _RAS2LPS @ np.asarray(affine, np.float64)[:3, :3]
        origin = _RAS2LPS @ np.asarray(affine, np.float64)[:3, 3]
        spacing = np.sqrt((A ** 2).sum(axis=0))
        spacing[spacing == 0] = 1.0
        direction = A / spacing
        return cls(origin=origin, spacing=spacing, direction=direction, size=tuple(int(s) for s in size))

    def to_ras_affine(self) -> np.ndarray:
        aff = np.eye(4)
        A = self.direction @ np.diag(self.spacing)
        aff[:3, :3] = _RAS2LPS @ A
        aff[:3, 3] = _RAS2LPS @ self.origin
        return aff

    # ---- ITK-equivalent coordinate transforms ----
    def index_to_physical(self, idx: np.ndarray) -> np.ndarray:
        """Continuous index (…,3) -> physical LPS point (…,3)."""
        idx = np.asarray(idx, np.float64)
        return idx @ (self.direction @ np.diag(self.spacing)).T + self.origin

    def physical_to_continuous_index(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, np.float64)
        inv = np.diag(1.0 / self.spacing) @ self.direction.T
        return (pts - self.origin) @ inv.T


def _affine_between(moving: Grid, ref: Grid) -> Tuple[np.ndarray, np.ndarray]:
    """Index-space map ref_index -> moving_continuous_index: i_m = M i_r + t."""
    A_m_inv = np.diag(1.0 / moving.spacing) @ moving.direction.T
    A_r = ref.direction @ np.diag(ref.spacing)
    M = A_m_inv @ A_r
    t = A_m_inv @ (ref.origin - moving.origin)
    return M, t


def affine_gather_resample(
    data: np.ndarray,
    M: np.ndarray,
    t: np.ndarray,
    out_shape: Tuple[int, int, int],
    *,
    method: str = "linear",
    default_value: float = 0.0,
    use_jax: bool = True,
):
    """Sample ``data`` (X,Y,Z) at continuous indices M @ i + t for every output
    index i in out_shape. Out-of-bounds -> default_value."""
    if use_jax:
        import jax.numpy as jnp

        out = _affine_gather_jax(
            jnp.asarray(data),
            jnp.asarray(np.asarray(M, np.float32).reshape(3, 3)),
            jnp.asarray(np.asarray(t, np.float32).reshape(3)),
            tuple(int(s) for s in out_shape),
            method,
            float(default_value),
        )
        return np.asarray(out)
    return _affine_gather_np(data, M, t, out_shape, method, default_value)


def _interp_core(data, coords, method: str, default_value: float, xp):
    """coords: [3, N] continuous indices into data (X,Y,Z)."""
    sx, sy, sz = data.shape
    cx, cy, cz = coords[0], coords[1], coords[2]

    inb = (
        (cx >= -0.5) & (cx <= sx - 0.5) & (cy >= -0.5) & (cy <= sy - 0.5)
        & (cz >= -0.5) & (cz <= sz - 0.5)
    )

    if method == "nearest":
        xi = xp.clip(xp.round(cx).astype("int32"), 0, sx - 1)
        yi = xp.clip(xp.round(cy).astype("int32"), 0, sy - 1)
        zi = xp.clip(xp.round(cz).astype("int32"), 0, sz - 1)
        vals = data[xi, yi, zi]
        return xp.where(inb, vals, default_value)

    if method != "linear":
        raise ValueError(f"Unknown interpolation: {method}")

    x0 = xp.floor(cx).astype("int32")
    y0 = xp.floor(cy).astype("int32")
    z0 = xp.floor(cz).astype("int32")
    fx = (cx - x0).astype(data.dtype)
    fy = (cy - y0).astype(data.dtype)
    fz = (cz - z0).astype(data.dtype)

    def g(xi, yi, zi):
        xi = xp.clip(xi, 0, sx - 1)
        yi = xp.clip(yi, 0, sy - 1)
        zi = xp.clip(zi, 0, sz - 1)
        return data[xi, yi, zi]

    c000 = g(x0, y0, z0)
    c100 = g(x0 + 1, y0, z0)
    c010 = g(x0, y0 + 1, z0)
    c110 = g(x0 + 1, y0 + 1, z0)
    c001 = g(x0, y0, z0 + 1)
    c101 = g(x0 + 1, y0, z0 + 1)
    c011 = g(x0, y0 + 1, z0 + 1)
    c111 = g(x0 + 1, y0 + 1, z0 + 1)

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    vals = c0 * (1 - fz) + c1 * fz
    return xp.where(inb, vals, xp.asarray(default_value, dtype=data.dtype))


def _make_coords(M, t, out_shape, xp):
    ix = xp.arange(out_shape[0])
    iy = xp.arange(out_shape[1])
    iz = xp.arange(out_shape[2])
    gx, gy, gz = xp.meshgrid(ix, iy, iz, indexing="ij")
    idx = xp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)]).astype("float32")  # [3,N]
    M = xp.asarray(M, dtype="float32").reshape(3, 3)
    t = xp.asarray(t, dtype="float32").reshape(3, 1)
    return M @ idx + t


def _affine_gather_np(data, M, t, out_shape, method, default_value):
    coords = _make_coords(np.asarray(M), np.asarray(t), out_shape, np)
    vals = _interp_core(np.asarray(data), coords, method, default_value, np)
    return vals.reshape(out_shape)


def _affine_gather_jax_impl(data, M, t, out_shape, method, default_value):
    import jax.numpy as jnp

    coords = _make_coords(M, t, out_shape, jnp)
    vals = _interp_core(data, coords, method, default_value, jnp)
    return vals.reshape(out_shape)


try:
    import jax as _jax

    # M/t stay dynamic so a new per-case transform never triggers a
    # recompile; only distinct (out_shape, method) pairs compile fresh.
    _affine_gather_jax = _jax.jit(_affine_gather_jax_impl, static_argnums=(3, 4, 5))
except Exception:  # pragma: no cover
    _affine_gather_jax = _affine_gather_jax_impl


# ---------------------------------------------------------------------------
# High-level ops (SimpleITK-equivalent semantics)
# ---------------------------------------------------------------------------
def resample_to_spacing(
    data: np.ndarray,
    grid: Grid,
    target_spacing: Sequence[float],
    *,
    method: str = "linear",
    default_value: float = 0.0,
    use_jax: bool = True,
) -> Tuple[np.ndarray, Grid]:
    """Regrid to target_spacing preserving origin/direction/FOV
    (reference: prepare_hecktor21.py:96-120)."""
    old_spacing = grid.spacing
    old_size = np.asarray(grid.size, np.int64)
    new_spacing = np.asarray([float(s) for s in target_spacing])
    new_size = np.maximum(np.round(old_size * (old_spacing / new_spacing)).astype(np.int64), 1)

    # same origin/direction: index map is a pure diagonal scale
    M = np.diag(new_spacing / old_spacing)
    t = np.zeros(3)
    out = affine_gather_resample(
        data, M, t, tuple(int(s) for s in new_size),
        method=method, default_value=default_value, use_jax=use_jax,
    )
    new_grid = replace(grid, spacing=new_spacing, size=tuple(int(s) for s in new_size))
    return out, new_grid


def resample_to_reference(
    data: np.ndarray,
    grid: Grid,
    ref_grid: Grid,
    *,
    method: str = "linear",
    default_value: float = 0.0,
    use_jax: bool = True,
) -> Tuple[np.ndarray, Grid]:
    """Identity-transform regrid onto ref_grid (reference: 79-93)."""
    M, t = _affine_between(grid, ref_grid)
    out = affine_gather_resample(
        data, M, t, ref_grid.size, method=method, default_value=default_value, use_jax=use_jax
    )
    return out, ref_grid


def bbox_mm_to_index_roi(
    grid: Grid,
    x1: float, x2: float, y1: float, y2: float, z1: float, z2: float,
):
    """Physical-space bbox (mm, ITK LPS) -> axis-aligned index ROI, robust to
    direction flips via all 8 corners (reference: 123-165)."""
    corners = np.array([(x, y, z) for x in (x1, x2) for y in (y1, y2) for z in (z1, z2)])
    idxs = grid.physical_to_continuous_index(corners)
    mins = idxs.min(axis=0)
    maxs = idxs.max(axis=0)
    start = np.floor(mins).astype(int)
    end = np.ceil(maxs).astype(int)
    size = (end - start + 1).astype(int)
    dbg = {
        "corners_mm": corners.tolist(),
        "corners_cont_idx": idxs.tolist(),
        "start_idx": start.tolist(),
        "end_idx": end.tolist(),
        "roi_size": size.tolist(),
    }
    return start.tolist(), size.tolist(), dbg


def pad_image(
    data: np.ndarray, grid: Grid, pad_before: Sequence[int], pad_after: Sequence[int],
    value: float,
) -> Tuple[np.ndarray, Grid]:
    """Constant-pad; origin shifts by -pad_before voxels in physical space."""
    pb = [int(p) for p in pad_before]
    pa = [int(p) for p in pad_after]
    out = np.pad(data, list(zip(pb, pa)), constant_values=value)
    shift = grid.direction @ (grid.spacing * (-np.asarray(pb, np.float64)))
    new_grid = replace(
        grid,
        origin=grid.origin + shift,
        size=tuple(int(s + b + a) for s, b, a in zip(grid.size, pb, pa)),
    )
    return out, new_grid


def crop_image(
    data: np.ndarray, grid: Grid, start: Sequence[int], size: Sequence[int]
) -> Tuple[np.ndarray, Grid]:
    st = [int(s) for s in start]
    sz = [int(s) for s in size]
    out = data[st[0] : st[0] + sz[0], st[1] : st[1] + sz[1], st[2] : st[2] + sz[2]]
    shift = grid.direction @ (grid.spacing * np.asarray(st, np.float64))
    new_grid = replace(grid, origin=grid.origin + shift, size=tuple(sz))
    return np.ascontiguousarray(out), new_grid
