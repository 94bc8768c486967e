"""Measure AOT serving-artifact replay vs the live jit on the real chip.

The deployment question for serving/export.py: does the deserialized
StableHLO artifact serve the flagship online-Tent workload at the live
jit's rate? Protocol mirrors bench.py's serving measurement (batch 8,
bf16, result-fenced checksum clock, pipelined dispatch); the artifact path
additionally wraps ``exported.call`` in one ``jax.jit`` — the deployment
pattern that compiles the replayed module once instead of re-staging it
per call.

    python scripts/bench_serving_artifact.py [--iters 20]

Prints one JSON line: live vol/s, artifact vol/s, ratio, artifact MB.
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

from multimodal_tta_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache
from multimodal_tta_tpu.utils.host_alloc import retain_host_memory

apply_platform_env()
retain_host_memory()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    enable_compilation_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench
    from multimodal_tta_tpu.serving import (
        export_adapt_serving,
        load_artifact,
        save_artifact,
    )

    batch = bench.BATCH
    shape = bench.SHAPE

    # ---- live jit (online Tent, flagship) ----------------------------
    run_once = bench.build_workload("online")
    for _ in range(args.warmup):
        run_once(sync=True)
    t0 = time.perf_counter()
    last = None
    for _ in range(args.iters):
        last = run_once(sync=False)
    int(last)
    live = batch * args.iters / (time.perf_counter() - t0)

    # ---- artifact ----------------------------------------------------
    state, _ = bench.build_adapter_state(predict_mode="inline", episodic=False)
    # rebuild the adapter alone (build_adapter_state returns the wrapped fn)
    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.registry import get_tta_method

    cfg = ConfigNode(
        {
            "task": {"seed": 0},
            "training": {"criterion": {"sigmoid": True}},
            "tta": {
                "method": "tent",
                "steps": 1,
                "lr": 1e-3,
                "optimizer": "sgd",
                "momentum": 0.9,
                "update": "norm",
                "episodic": False,
                "predict": "inline",
            },
        }
    )
    adapter = get_tta_method("tent")(
        cfg.tta, config=cfg, mesh=None, device_transform=bench.DEVICE_TRANSFORM
    )
    platform = jax.default_backend()
    exported, meta, leaves0 = export_adapt_serving(
        adapter,
        state,
        (batch,) + shape,
        threshold=0.3,
        predict_mode="inline",
        platforms=(platform,),
    )
    path = os.path.join(REPO_ROOT, ".serving_artifact.mttas")
    save_artifact(path, exported, meta, leaves0)
    size_mb = os.path.getsize(path) / 1e6
    art = load_artifact(path)

    call = jax.jit(art.call)  # compile the replayed module once
    checksum = bench._make_checksum()

    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(batch, *shape) * 100).astype(np.float32))
    key = jnp.asarray(np.asarray(jax.random.PRNGKey(0)))
    nv = jnp.int32(batch)
    fl = jnp.float32(np.nan)
    st = [jnp.asarray(l) for l in art.initial_state()]
    n = art.n_state

    def art_once(st, sync):
        out = call(*st, x, key, nv, fl)
        c = checksum(out[n + 1])
        return list(out[:n]), (int(c) if sync else c)

    for _ in range(args.warmup):
        st, _ = art_once(st, True)
    t0 = time.perf_counter()
    last = None
    for _ in range(args.iters):
        st, last = art_once(st, False)
    int(last)
    art_rate = batch * args.iters / (time.perf_counter() - t0)

    res = {
        "live_online_vol_s": round(live, 2),
        "artifact_online_vol_s": round(art_rate, 2),
        "artifact_over_live": round(art_rate / live, 4),
        "artifact_mb": round(size_mb, 1),
        "platform": platform,
        "iters": args.iters,
    }
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f)


if __name__ == "__main__":
    main()
