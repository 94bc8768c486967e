"""Pallas TPU kernel: min-plus line transform for the euclidean distance
transform.

The EDT in ops/surface.py applies, per axis, the sampled-function squared
distance transform ``g[r, i] = min_j (f[r, j] + ((i - j) * s)^2)`` to every
line of the volume. The jnp fallback materializes [chunk, n, n] broadcast
temporaries in HBM; this kernel tiles rows and output columns into VMEM and
streams the j-reduction in small blocks, so the O(n^2) min-add runs entirely
out of VMEM on the VPU.

Grid: (rows / BLOCK_R, n / BLOCK_I). Each program instance owns an output
tile [BLOCK_R, BLOCK_I], reads the full f row-block [BLOCK_R, n] plus the
cost column-block [n, BLOCK_I], and folds the j axis in JBLK-sized chunks.

Used on TPU backends; ops/surface.py falls back to the pure-jnp path
elsewhere (and in interpret mode for tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 256
BLOCK_I = 128
JBLK = 8


def _minplus_kernel(ft_ref, cost_ref, out_ref):
    """ft_ref: [N, BLOCK_R] (f transposed — j on the sublane axis so JBLK
    slices are sublane-aligned; Mosaic only lane-slices at 128 granularity);
    cost_ref: [N, BLOCK_I]; out_ref: [BLOCK_R, BLOCK_I]."""
    n = ft_ref.shape[0]  # padded to a JBLK multiple by the wrapper
    acc = jnp.full(out_ref.shape, jnp.inf, dtype=out_ref.dtype)

    def body(jb, acc):
        j0 = jb * JBLK
        f_blk = ft_ref[pl.ds(j0, JBLK), :]         # [J, R]
        c_blk = cost_ref[pl.ds(j0, JBLK), :]       # [J, I]
        cand = f_blk[:, :, None] + c_blk[:, None, :]  # [J, R, I]
        return jnp.minimum(acc, jnp.min(cand, axis=0))

    acc = jax.lax.fori_loop(0, n // JBLK, body, acc)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def minplus_pallas(f: jnp.ndarray, cost: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """f: [rows, n] squared-distance estimates; cost: [n, n] with
    cost[j, i] = ((i - j) * spacing)^2. Returns g [rows, n].

    rows and n are padded internally to the block sizes; +inf padding rows
    and a +inf-free cost slab keep the reduction exact.
    """
    rows, n = f.shape
    pad_r = (-rows) % BLOCK_R
    pad_i = (-n) % BLOCK_I
    pad_j = (-n) % JBLK  # j axis must be a JBLK multiple for the kernel loop

    # +inf padding on the j axis never wins the min; f enters transposed
    f_p = jnp.pad(f, ((0, pad_r), (0, pad_j)), constant_values=jnp.inf).T  # [nj, rows_p]
    # pad the i (output) axis of cost (discarded) and the j axis (masked by +inf f)
    cost_p = jnp.pad(cost, ((0, pad_j), (0, pad_i)), constant_values=0.0)

    nj = n + pad_j
    grid = ((rows + pad_r) // BLOCK_R, (n + pad_i) // BLOCK_I)

    out = pl.pallas_call(
        _minplus_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nj, BLOCK_R), lambda r, i: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((nj, BLOCK_I), lambda r, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_R, BLOCK_I), lambda r, i: (r, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows + pad_r, n + pad_i), f.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (rows + pad_r) * nj * (n + pad_i),
            bytes_accessed=4 * ((rows + pad_r) * nj + nj * (n + pad_i) + (rows + pad_r) * (n + pad_i)),
            transcendentals=0,
        ),
    )(f_p, cost_p)
    return out[:rows, :n]


def tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
