"""Windowed-adaptation serving rate for the HBM-walled BraTS midfusion model.

The one workload still near its round-1 speed (VERDICT r4 weak #6): the
78.6M-param 4-encoder midfusion model serves online Tent at 3.18 vol/s/chip,
whole-volume 4x[160,192,160] at batch 1 — batch 2 deterministically fails to
compile (13.7 GiB measured activations, the backward's full-resolution
stash). The in-tree single-chip lever never applied to it is ``tta.window``:
compute the adaptation objective (and its backward) on k random ROIs, serve
predictions from a separate full-volume FORWARD — the full-volume backward
disappears, which is exactly what the batch-2 wall is made of.

Measured protocols (random weights — rate only; the quality side runs in
validate_tta_brats.py --window at fixture scale):

  whole_b1   — whole-volume online Tent, predict=inline, batch 1 (baseline)
  window_b1  — ROI-adapt (4x[32,96,96]) + full-volume post predict, batch 1
  window_b2  — same at batch 2: does windowing break the compile wall?

    python scripts/bench_midfusion_window.py [--iters 8]

One JSON line per protocol; BASELINE.md records the verdict.
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

SHAPE = (160, 192, 160, 4)  # D,H,W,M — full BraTS working shape

# mirror of configs/_global_patches/brats.yaml transforms (per-modality
# nonzero-masked z-score)
BRATS_POLICY = {
    "enabled": True,
    "channel_names": ["t1n", "t1c", "t2w", "t2f"],
    "channels": {
        m: {"zscore": {"masked": True, "mask_gt": 0.0, "eps": 1e-6}}
        for m in ["t1n", "t1c", "t2w", "t2f"]
    },
}
DEVICE_TRANSFORM = {
    "normalize": True,
    "intensity_policy": BRATS_POLICY,
    "channel_names": ["t1n", "t1c", "t2w", "t2f"],
}


def build(batch: int, window: bool, steps: int = 1):
    import jax
    import jax.numpy as jnp
    import optax

    import multimodal_tta_tpu.tta  # noqa: F401
    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.core.train_state import TrainState
    from multimodal_tta_tpu.registry import get_model, get_tta_method

    model = get_model("unet_multimodal_midfusion")(
        num_modalities=4, num_classes=3, dtype=jnp.bfloat16, remat=True)
    x0 = jnp.zeros((batch,) + SHAPE, jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=optax.identity())

    tta_node = {
        "method": "tent", "steps": steps, "lr": 1e-3, "optimizer": "sgd",
        "momentum": 0.9, "update": "norm", "episodic": False,
    }
    if window:
        tta_node["window"] = {"enabled": True, "roi_size": [32, 96, 96],
                              "windows_per_step": 4}
    cfg = ConfigNode({
        "task": {"seed": 0},
        "training": {"criterion": {"sigmoid": True}},
        "tta": tta_node,
    })
    adapter = get_tta_method("tent")(
        cfg.tta, config=cfg, mesh=None, device_transform=DEVICE_TRANSFORM)
    mode = "post" if window else "inline"
    return state, adapter.make_adapt_predict_fn(state, threshold=0.5,
                                                predict_mode=mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--skip-b2", action="store_true")
    ap.add_argument("--protocols", nargs="+", default=None,
                    help="subset of {whole_b1, window_b1, window_b2} — the "
                         "whole-volume fused step's cold compile alone can "
                         "eat a wall budget; the r2-measured 3.18 baseline "
                         "already exists, so reruns can target the windowed "
                         "protocols only")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    checksum = bench._make_checksum()
    rng = np.random.RandomState(0)

    protocols = [("whole_b1", 1, False), ("window_b1", 1, True)]
    if not args.skip_b2:
        protocols.append(("window_b2", 2, True))
    if args.protocols:
        protocols = [p for p in protocols if p[0] in set(args.protocols)]

    for name, batch, window in protocols:
        x = jnp.asarray((rng.randn(batch, *SHAPE) * 100).astype(np.float32))
        try:
            state, ap_fn = build(batch, window)
            carry = {"s": state}

            def once(sync=True):
                carry["s"], pred = ap_fn(carry["s"], x, batch)
                c = checksum(pred)
                return int(c) if sync else c

            for _ in range(args.warmup):
                once(True)
            t0 = time.perf_counter()
            last = None
            for _ in range(args.iters):
                last = once(False)
            int(last)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "protocol": name, "batch": batch, "window": window,
                "ms_per_batch": round(1e3 * dt / args.iters, 1),
                "volumes_per_sec_per_chip": round(batch * args.iters / dt, 2),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "protocol": name, "batch": batch, "window": window,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)


if __name__ == "__main__":
    main()
