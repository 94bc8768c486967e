"""Pallas TPU kernel: fused InstanceNorm statistics + affine + activation.

The profiled cost of the flagship UNet's level-0/1 stack is the small-C
NDHWC lane padding: C=32/64 < the 128-lane tile, and the padding is the
PHYSICAL HBM layout (measured via ``memory_analysis``: a [.,.,.,.,32] f32
array occupies exactly 4.00x its logical bytes, C=64 2.00x, bf16 4.00x).
Every traversal of those tensors — by XLA fusions or by any Pallas kernel
reading the same logical array — pays that padding; a kernel can therefore
only win by cutting the NUMBER of traversals, not their width.

This kernel implements the minimum-traversal schedule for instance norm:

  pass 1 (stats):      one padded read  — per-(B,C) sum / sum-of-squares,
                       accumulated in VMEM across spatial grid blocks;
  pass 2 (normalize):  one padded read + one padded write — affine +
                       optional ReLU fused into the same block visit.

Total: 2 reads + 1 write of the padded tensor, the information-theoretic
floor for a two-moment normalization that cannot fit the (B,) slice in
VMEM (a level-0 slice is 48*144*144*32*4B = 127 MB >> 16 MB VMEM).

Whether XLA's own fusion already achieves this floor is an empirical
question — scripts/bench_inorm_kernel.py measures both on the real chip and
BASELINE.md records the adopt/reject verdict with ms. Reference parity:
none (the reference's InstanceNorm is torch eager; this is TPU-native perf
work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget per x block (bytes, PADDED lanes): keep block + double-buffer
# well under the ~16 MB/core VMEM
_BLOCK_BYTES = 3 * 1024 * 1024


def _pick_hblk(h: int, w: int, c: int, itemsize: int) -> int:
    c_pad = ((c + 127) // 128) * 128
    per_row = w * c_pad * itemsize
    best = 1
    for cand in range(1, h + 1):
        if h % cand == 0 and cand * per_row <= _BLOCK_BYTES:
            best = cand
    return best


def _stats_kernel(x_ref, sum_ref, sq_ref):
    d = pl.program_id(1)
    h = pl.program_id(2)
    xb = x_ref[0, 0].astype(jnp.float32)  # [hblk, W, C]
    s = jnp.sum(xb, axis=(0, 1))[None, :]
    q = jnp.sum(xb * xb, axis=(0, 1))[None, :]

    first = (d == 0) & (h == 0)

    @pl.when(first)
    def _init():
        sum_ref[0] = s
        sq_ref[0] = q

    @pl.when(jnp.logical_not(first))
    def _acc():
        sum_ref[0] += s
        sq_ref[0] += q


def _norm_kernel(x_ref, mu_ref, rstd_ref, g_ref, b_ref, y_ref, *, act):
    xb = x_ref[0, 0].astype(jnp.float32)           # [hblk, W, C]
    mu = mu_ref[0, 0, :][None, None, :]
    rs = rstd_ref[0, 0, :][None, None, :]
    g = g_ref[0, :][None, None, :]
    b = b_ref[0, :][None, None, :]
    y = (xb - mu) * rs * g + b
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    y_ref[0, 0] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "act", "interpret"))
def fused_instance_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    eps: float = 1e-5,
    act: str | None = "relu",
    interpret: bool = False,
) -> jnp.ndarray:
    """InstanceNorm over the spatial dims of NDHWC ``x`` ([B, D, H, W, C]),
    with the affine transform and optional ReLU fused into the second pass.
    Returns ``act((x - mean) * rsqrt(var + eps) * gamma + beta)`` with
    mean/var per (B, C) — numerics-parity with the jnp reference asserted
    in tests/test_pallas_kernels.py (interpret mode + real backend)."""
    B, D, H, W, C = x.shape
    hblk = _pick_hblk(H, W, C, jnp.dtype(x.dtype).itemsize)
    grid = (B, D, H // hblk)

    x_spec = pl.BlockSpec(
        (1, 1, hblk, W, C), lambda b, d, h: (b, d, h, 0, 0),
        memory_space=pltpu.VMEM)
    # [B, 1, C] stats layout: Mosaic requires the last two block dims to be
    # divisible by (8, 128) or EQUAL to the array dims — (1, 1, C) blocks on
    # a (B, 1, C) array satisfy the equality form for any B and small C
    bc_spec = pl.BlockSpec((1, 1, C), lambda b, d, h: (b, 0, 0),
                           memory_space=pltpu.VMEM)

    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[x_spec],
        out_specs=[bc_spec, bc_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        interpret=interpret,
    )(x)

    n = D * H * W
    mean = sums / n                       # [B, 1, C]
    var = sqs / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    g2 = gamma.reshape(1, C).astype(jnp.float32)
    b2 = beta.reshape(1, C).astype(jnp.float32)
    param_spec = pl.BlockSpec((1, C), lambda b, d, h: (0, 0),
                              memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(_norm_kernel, act=act),
        grid=grid,
        in_specs=[x_spec, bc_spec, bc_spec, param_spec, param_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, mean, rstd, g2, b2)
    return y


def instance_norm_reference(x, gamma, beta, *, eps: float = 1e-5,
                            act: str | None = "relu"):
    """The XLA-fused jnp equivalent (what the model's norm layer computes) —
    the baseline the kernel is measured against."""
    xf = x.astype(jnp.float32)
    m = xf.mean(axis=(1, 2, 3), keepdims=True)
    v = ((xf - m) ** 2).mean(axis=(1, 2, 3), keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(v + eps) * gamma + beta
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)
