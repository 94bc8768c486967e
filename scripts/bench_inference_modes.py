"""Measured inference-mode costs: plain / sliding-window / flip-TTA.

The evaluation layer offers three forward modes (evaluation/seg_eval.py):
whole-volume forward, scanned sliding-window inference with gaussian or
constant blending (ops/sliding_window.py — the north star names it), and
flip-averaged test-time augmentation (ops/flip_tta.py). Their accuracy
behavior is unit-tested; this script measures what each mode COSTS on the
real chip so BASELINE.md can state the serving economics rather than imply
them.

    python scripts/bench_inference_modes.py [--iters 10] [--out r.json]

Flagship UNet3D at the HECKTOR working shape, batch 8, bf16, forward-only
(pre-normalized input — normalization cost is identical across modes and
~0.65% of a step, measured round 2). Result-fenced timing per the tunnel
caveat in BASELINE.md. One JSON line per mode; windows/forwards counted so
the efficiency column (cost multiple vs the work multiple) is explicit.
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

SHAPE = tuple(
    int(s) for s in os.environ.get("BENCH_IM_SHAPE", "48,144,144,2").split(","))
BATCH = int(os.environ.get("BENCH_IM_BATCH", "8"))
THRESHOLD = 0.3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_tta_tpu.ops.flip_tta import flip_combos
    from multimodal_tta_tpu.ops.sliding_window import (
        sliding_window_inference,
        window_starts,
    )
    from multimodal_tta_tpu.registry import get_model

    model = get_model("unet")(
        in_channels=2, num_classes=1, channels=(32, 64, 128, 256, 512),
        strides=(2, 2, 2, 2), num_res_units=2, norm="INSTANCE", act="RELU",
        dtype=jnp.bfloat16, remat=False,
    )
    x0 = jnp.zeros((BATCH,) + SHAPE, jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    def fwd(x):
        return model.apply(variables, x, train=False)

    def mask_of(logits):
        return (jax.nn.sigmoid(logits.astype(jnp.float32)) >= THRESHOLD)

    @jax.jit
    def checksum(m):
        return m.astype(jnp.uint32).sum()

    modes = {}
    modes["plain"] = (jax.jit(lambda x: mask_of(fwd(x))), {"forwards": 1})

    for axes in ((2, 3), (1, 2, 3)):
        n = len(flip_combos(axes))

        def flip_mode(x, axes=axes):
            from multimodal_tta_tpu.ops.flip_tta import flip_averaged_probs

            _, probs = flip_averaged_probs(
                fwd, x, axes, lambda lg: jax.nn.sigmoid(lg.astype(jnp.float32)))
            return probs >= THRESHOLD

        modes[f"flip_tta_axes{''.join(map(str, axes))}"] = (
            jax.jit(flip_mode), {"forwards": n})

    # ROIs stay divisible by 16 (four stride-2 encoder levels); the last is
    # the degenerate whole-volume window (sanity: ~plain forward cost)
    rois = ((32, 96, 96, 0.25), (32, 96, 96, 0.5), (16, 48, 48, 0.25),
            (SHAPE[0], SHAPE[1], SHAPE[2], 0.25))
    for rd, rh, rw, ov in rois:
        roi = (rd, rh, rw)
        nw = 1
        for size, r in zip(SHAPE[:3], roi):
            nw *= len(window_starts(size, r, ov))

        def sw_mode(x, roi=roi, ov=ov):
            lg = sliding_window_inference(
                fwd, x, roi, num_classes=1, overlap=ov, mode="gaussian")
            return mask_of(lg)

        modes[f"sliding_window_{'x'.join(map(str, roi))}_ov{ov}"] = (
            jax.jit(sw_mode), {"windows": nw, "forwards": nw})

    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(BATCH, *SHAPE) * 100).astype(np.float32))

    rows = []
    plain_vps = None
    for name, (fn, meta) in modes.items():
        for _ in range(args.warmup):
            int(checksum(fn(x)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = fn(x)
        int(checksum(c))  # result-fenced: in-order execution drains the queue
        wall = time.perf_counter() - t0
        vps = BATCH * args.iters / wall
        row = {"mode": name, **meta,
               "volumes_per_sec_per_chip": round(vps, 2),
               "s_per_batch": round(wall / args.iters, 4)}
        if name == "plain":
            plain_vps = vps
        else:
            row["cost_multiple_vs_plain"] = round(plain_vps / vps, 2)
            row["work_multiple"] = meta["forwards"]
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
