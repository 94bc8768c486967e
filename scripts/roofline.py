"""Roofline quantification: achieved TFLOP/s and HBM GB/s vs chip peaks.

Answers the demanding perf question — "what fraction of THIS chip" — for the
framework's serving workloads, instead of the easy one ("how many times a
CPU").  For each model family it reports, for the plain forward and for the
fused online-Tent adapt+predict step (the headline workload):

  - FLOPs and bytes-accessed from XLA's compiled-HLO cost model
    (``compiled.cost_analysis()`` — the same numbers the compiler schedules
    by; bytes is the fused-op HBM-traffic estimate),
  - measured wall time on the real chip (result-fenced clock — tunnel
    caveat, bench.py:_make_checksum),
  - achieved TFLOP/s, achieved GB/s, arithmetic intensity, which roof binds
    at the chip's ridge point, and the fraction of that roof achieved.

Peaks default to TPU v5e: ~197 TFLOP/s bf16, ~819 GB/s HBM (the in-repo
int8/matmul probe measured 122.5 TFLOP/s bf16 achievable on pure matmuls —
BASELINE.md — so the matmul-achievable roof is also reported).

    python scripts/roofline.py [--models unet unet_ws unetr] [--iters 10]

Prints one JSON line per (model, workload). The reference publishes no
performance numbers at all (reference README.md:1) — this bar is
self-imposed rigor, not parity.
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

# TPU v5e peaks (overridable for other parts)
PEAK_TFLOPS = float(os.environ.get("ROOFLINE_PEAK_TFLOPS", "197.0"))
PEAK_GBS = float(os.environ.get("ROOFLINE_PEAK_GBS", "819.0"))
# measured-achievable matmul roof on THIS chip (BASELINE.md int8/MXU probe)
ACHIEVABLE_TFLOPS = float(os.environ.get("ROOFLINE_ACHIEVABLE_TFLOPS", "122.5"))


def _cost(compiled) -> tuple:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _timed(fn_sync, fn_async, iters: int, warmup: int) -> float:
    """Seconds per call, result-fenced (the async calls pipeline; the final
    sync gates on a scalar derived from the last result)."""
    for _ in range(warmup):
        fn_sync()
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn_async()
    int(last)  # fences the whole pipeline
    return (time.perf_counter() - t0) / iters


def _row(model: str, workload: str, flops: float, nbytes: float, sec: float,
         batch: int) -> dict:
    tflops = flops / sec / 1e12
    gbs = nbytes / sec / 1e9
    ai = flops / max(nbytes, 1.0)
    ridge = PEAK_TFLOPS * 1e12 / (PEAK_GBS * 1e9)  # FLOP/byte
    bound = "compute" if ai >= ridge else "memory"
    frac = (tflops / PEAK_TFLOPS) if bound == "compute" else (gbs / PEAK_GBS)
    return {
        "model": model,
        "workload": workload,
        "batch": batch,
        "ms": round(sec * 1e3, 2),
        "gflops_per_call": round(flops / 1e9, 1),
        "gbytes_per_call": round(nbytes / 1e9, 3),
        "achieved_tflops": round(tflops, 2),
        "achieved_gbs": round(gbs, 1),
        "arithmetic_intensity_flop_per_byte": round(ai, 1),
        "ridge_flop_per_byte": round(ridge, 1),
        "bound": bound,
        "pct_of_binding_roof": round(100.0 * frac, 1),
        "pct_of_bf16_peak": round(100.0 * tflops / PEAK_TFLOPS, 1),
        "pct_of_matmul_achievable": round(100.0 * tflops / ACHIEVABLE_TFLOPS, 1),
        "pct_of_hbm_peak": round(100.0 * gbs / PEAK_GBS, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["unet", "unet_ws", "unetr"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--skip-adapt", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    rows = []
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(bench.BATCH, *bench.SHAPE) * 100).astype(np.float32))
    checksum = bench._make_checksum()

    for model in args.models:
        os.environ["BENCH_MODEL"] = model

        # ---- plain forward (bench_model.py protocol, no normalizer) ----
        state, _ = bench.build_adapter_state(predict_mode="post", episodic=True)
        fwd = jax.jit(lambda p, xx: state.apply_fn({"params": p}, xx, train=False))
        compiled = fwd.lower(state.params, x).compile()
        flops, nbytes = _cost(compiled)
        sec = _timed(
            lambda: int(checksum(fwd(state.params, x))),
            lambda: checksum(fwd(state.params, x)),
            args.iters, args.warmup,
        )
        row = _row(model, "forward", flops, nbytes, sec, bench.BATCH)
        rows.append(row)
        print(json.dumps(row), flush=True)

        # ---- fused online-Tent adapt+predict (the headline step) ----
        if not args.skip_adapt:
            from multimodal_tta_tpu.conf import ConfigNode
            from multimodal_tta_tpu.registry import get_tta_method

            cfg = ConfigNode({
                "task": {"seed": 0},
                "training": {"criterion": {"sigmoid": True}},
                "tta": {"method": "tent", "steps": 1, "lr": 1e-3,
                        "optimizer": "sgd", "momentum": 0.9, "update": "norm",
                        "episodic": False},
            })
            adapter = get_tta_method("tent")(
                cfg.tta, config=cfg, mesh=None,
                device_transform=bench.DEVICE_TRANSFORM,
            )
            step = adapter._build_adapt_step(
                state, predict_threshold=0.3, predict_mode="inline")
            opt0 = adapter._tx.init(adapter.trainable_subtree(state.params))
            sargs = (state.params, state.batch_stats, opt0, x,
                     jax.random.PRNGKey(0), jnp.int32(bench.BATCH),
                     jnp.float32(jnp.nan))
            compiled = step.lower(*sargs).compile()
            flops, nbytes = _cost(compiled)

            def call_async():
                out = step(*sargs)
                return checksum(out[-1])

            sec = _timed(lambda: int(call_async()), call_async,
                         args.iters, args.warmup)
            row = _row(model, "online_tent_step", flops, nbytes, sec, bench.BATCH)
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "peaks": {
                "bf16_tflops": PEAK_TFLOPS, "hbm_gbs": PEAK_GBS,
                "matmul_achievable_tflops": ACHIEVABLE_TFLOPS}}, f, indent=2)


if __name__ == "__main__":
    main()
