"""Measure the fused InstanceNorm Pallas kernel vs XLA's own fusion.

The VERDICT-r4 experiment: the flagship's profiled bottleneck is the
level-0/1 small-C InstanceNorm traffic on physically lane-padded NDHWC
tensors (4x at C=32, 2x at C=64 — measured, see
pallas/fused_instance_norm.py). Three contenders, timed result-fenced on
the real chip at the flagship's level-0 and level-1 shapes:

  xla        — the jnp instance-norm+affine+relu XLA compiles today
  pallas     — the minimum-traversal fused kernel (2R + 1W of the padded
               tensor)
  xla_ncdhw  — the channel-blocked LAYOUT experiment: same math with the
               tensor stored NCDHW (W minor: 144 -> one 1.78x-padded lane
               tile instead of C=32's 4x), measuring what a layout change
               (not a kernel) would buy the norm in isolation

    python scripts/bench_inorm_kernel.py [--iters 20]

Prints one JSON line per (shape, impl). The adopt/reject verdict goes to
BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.utils.jax_setup import (  # noqa: E402
    apply_platform_env,
    enable_compilation_cache,
)

apply_platform_env()
enable_compilation_cache()

# flagship UNet level-0 and level-1 activation shapes (batch 8, bf16 compute)
SHAPES = [
    ("level0", (8, 48, 144, 144, 32)),
    ("level1", (8, 24, 72, 72, 64)),
]


def _timed(sync_call, async_call, iters, warmup):
    for _ in range(warmup):
        sync_call()
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = async_call()
    int(last)  # result-fenced (tunnel caveat — bench.py:_make_checksum)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_tta_tpu.pallas.fused_instance_norm import (
        fused_instance_norm,
        instance_norm_reference,
    )

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    @jax.jit
    def checksum(y):
        return y.astype(jnp.float32).sum().astype(jnp.uint32)

    @jax.jit
    def xla_ncdhw(xt, g, b):
        # x stored [B, C, D, H, W]; stats over (2,3,4)
        xf = xt.astype(jnp.float32)
        m = xf.mean(axis=(2, 3, 4), keepdims=True)
        v = ((xf - m) ** 2).mean(axis=(2, 3, 4), keepdims=True)
        y = (xf - m) * jax.lax.rsqrt(v + 1e-5) * g[None, :, None, None, None] \
            + b[None, :, None, None, None]
        return jnp.maximum(y, 0.0).astype(xt.dtype)

    rng = np.random.RandomState(0)
    for tag, shape in SHAPES:
        C = shape[-1]
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dt)
        xt = jnp.transpose(x, (0, 4, 1, 2, 3))  # NCDHW copy, staged once
        g = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)

        ref = jax.jit(lambda x, g, b: instance_norm_reference(x, g, b))
        impls = {
            "xla": lambda: checksum(ref(x, g, b)),
            "pallas": lambda: checksum(fused_instance_norm(x, g, b)),
            "xla_ncdhw": lambda: checksum(xla_ncdhw(xt, g, b)),
        }

        # numerics cross-check before timing (real backend)
        err = float(jnp.max(jnp.abs(
            fused_instance_norm(x, g, b).astype(jnp.float32)
            - ref(x, g, b).astype(jnp.float32))))

        logical_gb = np.prod(shape) * jnp.dtype(dt).itemsize / 1e9
        pad = 128 // min(C, 128) if C < 128 else 1
        for name, call in impls.items():
            sec = _timed(lambda c=call: int(c()), call, args.iters, args.warmup)
            print(json.dumps({
                "shape": tag, "dims": list(shape), "dtype": args.dtype,
                "impl": name, "ms": round(sec * 1e3, 3),
                "logical_gb": round(logical_gb, 3),
                "lane_pad_x": pad,
                # effective traffic if the op moved 2R+1W padded traversals
                "padded_3pass_gbs": round(3 * logical_gb * pad / sec, 1),
                "kernel_vs_ref_max_err": round(err, 5),
            }), flush=True)


if __name__ == "__main__":
    main()
