"""Model-family serving bench: forward-only + online-Tent rows for one model.

BASELINE.md carries a per-family serving table (unet / unet_ws / unetr /
moe-unetr / swin_unetr / segresnet ...) with two protocols measured at the
HECKTOR working shape: plain forward-only segmentation and official online
Tent (predict=inline, continual). The earlier rows were measured with
ad-hoc drivers; this script is the reusable one — it reuses bench.py's
model construction (BENCH_MODEL & friends) and its result-fenced timing
pattern (the tunnel caveat: never trust block_until_ready, gate the clock
on a scalar derived from the result).

    BENCH_MODEL=segresnet python scripts/bench_model.py [--iters 10]

Prints one JSON line per protocol. The reference has a single model family
on this workload (MONAI UNet, reference src/models/unet.py:14-69) and no
serving bench at all; these rows are framework-native evidence.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--skip-forward", action="store_true")
    ap.add_argument("--skip-online", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    import bench

    name = os.environ.get("BENCH_MODEL", "unet")

    if not args.skip_forward:
        # forward-only: the same model construction bench.py uses, plain
        # apply (no normalizer — identical across families, ~0.65% of a step)
        state, _ = bench.build_adapter_state(predict_mode="post", episodic=True)
        fwd = jax.jit(lambda p, x: state.apply_fn({"params": p}, x, train=False))
        checksum = bench._make_checksum()
        rng = np.random.RandomState(0)
        x = jax.numpy.asarray(
            (rng.randn(bench.BATCH, *bench.SHAPE) * 100).astype(np.float32))
        for _ in range(args.warmup):
            int(checksum(fwd(state.params, x)))
        t0 = time.perf_counter()
        last = None
        for _ in range(args.iters):
            last = checksum(fwd(state.params, x))
        int(last)  # fences the pipeline (tunnel caveat)
        dt = time.perf_counter() - t0
        vps = bench.BATCH * args.iters / dt
        print(json.dumps({
            "model": name, "protocol": "forward_only",
            "ms_per_batch": round(1e3 * dt / args.iters, 1),
            "volumes_per_sec_per_chip": round(vps, 1),
            "batch": bench.BATCH,
        }))

    if not args.skip_online:
        vps = bench.measure_device(args.iters, warmup=args.warmup,
                                   workload="online")
        print(json.dumps({
            "model": name, "protocol": "online_tent",
            "volumes_per_sec_per_chip": round(vps, 1),
            "batch": bench.BATCH,
        }))


if __name__ == "__main__":
    main()
