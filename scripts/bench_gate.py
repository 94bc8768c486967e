"""Entropy-gated serving economics on the chip (tta.stream.gate).

Measures, at the headline bench shape (flagship UNet, batch 8, HECKTOR
working shape, result-fenced timing — the bench.py tunnel pattern):

  forward_gate — the gate's FAST PATH: ``make_forward_predict_fn`` (plain
                 inference + thresholding + batch-mean adaptation entropy
                 fused in one dispatch, no backward, no optimizer state).
                 This is what every in-domain batch costs under the gate.
  online_adapt — the escalated path: official online Tent (1-step continual
                 adapt, predictions from the adaptation forward) — what
                 every batch costs WITHOUT the gate.
  escalation   — the one-off cost of a threshold break: the trigger batch
                 pays the probe forward AND is re-served through the adapt
                 path (gate semantics: the batch that detects drift is not
                 served un-adapted), i.e. one duplicate forward.
  reprobe      — the per-probe cost of the periodic re-anchor's forward
                 re-probe when the stream is still shifted: one forward
                 then re-escalation (same duplicate-forward shape).

Quality companion: scripts/validate_stream_tta.py --gate (the two-domain
stream protocol). Reference analogue: the per-domain serving machinery at
reference src/evaluation/seg_eval.py:362-392 — the gate itself is new
capability, so these rows are framework-native evidence.

    python scripts/bench_gate.py [--iters 20]   # batch via BENCH_BATCH
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from multimodal_tta_tpu.utils.watchdog import DispatchWatchdog

    # this bench measures the HEADLINE protocol only (flagship unet, tent
    # steps=1): the gate adapter below is a hand-built twin of that config,
    # so bench.py's env knobs would silently de-synchronize the two paths
    conflicting = [k for k in ("BENCH_TTA_METHOD", "BENCH_TTA_STEPS",
                               "BENCH_TTA_REGEX", "BENCH_MODEL") if os.environ.get(k)]
    if conflicting:
        raise SystemExit(
            f"[bench_gate] {conflicting} set — this bench pins the headline "
            "tent config; unset them (the adapt and gate paths must measure "
            "the same configuration)"
        )

    with DispatchWatchdog(float(os.environ.get("BENCH_GATE_DEADLINE", "900")),
                          what="gate-economics bench"):
        # same construction as the headline bench: full flagship + Tent
        # (continual, predict inline) with the fused adapt+predict path
        state, adapt_predict = bench.build_adapter_state(
            predict_mode="inline", episodic=False
        )
        # rebuild the adapter alone to get the gate fast path off the SAME
        # config (build_adapter_state returns only the fused fn; the gate fn
        # hangs off the adapter, so construct it the same way)
        import multimodal_tta_tpu.tta  # noqa: F401
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
        fwd = adapter.make_forward_predict_fn(state, threshold=0.3)
        checksum = bench._make_checksum()

        rng = np.random.RandomState(0)
        x = jnp.asarray((rng.randn(bench.BATCH, *bench.SHAPE) * 100).astype(np.float32))
        n = bench.BATCH

        def time_pipeline(fn, iters, warmup):
            for _ in range(warmup):
                int(checksum(fn()))
            t0 = time.perf_counter()
            last = None
            for _ in range(iters):
                last = checksum(fn())
            int(last)  # result-derived fence (tunnel caveat — bench.py)
            return (time.perf_counter() - t0) / iters

        # 1) gate fast path: forward + fused entropy probe, no backward
        t_fwd = time_pipeline(lambda: fwd(state, x, n)[0], args.iters, args.warmup)

        # 2) escalated path: official online Tent (state carries)
        carry = {"s": state}

        def adapt_once():
            carry["s"], pred = adapt_predict(carry["s"], x, n)
            return pred

        t_adapt = time_pipeline(adapt_once, args.iters, args.warmup)

        # 3) escalation batch: probe forward + same-batch adapt re-serve
        def escalate_once():
            _, _, _ = fwd(carry["s"], x, n)  # (pred, ent_obj, ent_gate)
            carry["s"], pred = adapt_predict(carry["s"], x, n)
            return pred

        t_escal = time_pipeline(escalate_once, args.iters, args.warmup)

    b = bench.BATCH
    out = {
        "batch": b,
        "forward_gate_volumes_per_sec_per_chip": round(b / t_fwd, 2),
        "online_adapt_volumes_per_sec_per_chip": round(b / t_adapt, 2),
        "gate_speedup_vs_adapt": round(t_adapt / t_fwd, 3),
        "escalation_batch_ms": round(1e3 * t_escal, 1),
        "adapt_batch_ms": round(1e3 * t_adapt, 1),
        "forward_batch_ms": round(1e3 * t_fwd, 1),
        # one escalation (or one still-shifted re-probe) costs the probe
        # forward on top of the adapt it would pay anyway:
        "escalation_overhead_ms": round(1e3 * (t_escal - t_adapt), 1),
        "escalation_overhead_vs_forward": round((t_escal - t_adapt) / t_fwd, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
