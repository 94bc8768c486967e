"""Capture a TPU profiler trace of the flagship forward (or adapt) step and
print the top device ops — the round-2 MXU-utilization starting point.

    python scripts/profile_top_ops.py [--adapt] [--model unet|unetr|swin_unetr] \
        [--batch 8] [--out /tmp/tpu_profile]

Writes an xplane trace viewable in TensorBoard/xprof and prints an aggregate
per-op device-time table.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()  # honor JAX_PLATFORMS under sitecustomize pins
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp


def build(batch: int, adapt: bool, model_name: str = "unet"):
    import multimodal_tta_tpu.models  # noqa: F401 — registers the families
    from multimodal_tta_tpu.registry import get_model

    if model_name in ("unetr", "swin_unetr"):
        model = get_model(model_name)(
            in_channels=2, num_classes=1, dtype=jnp.bfloat16,
        )
    else:
        model = get_model(model_name)(
            in_channels=2, num_classes=1, channels=(32, 64, 128, 256, 512),
            strides=(2, 2, 2, 2), num_res_units=2, norm="INSTANCE",
            dtype=jnp.bfloat16,
        )
    x = jnp.asarray(np.random.RandomState(0).randn(batch, 48, 144, 144, 2).astype(np.float32))
    v = jax.jit(lambda k, a: model.init(k, a, train=False))(jax.random.PRNGKey(0), x)

    if not adapt:
        fwd = jax.jit(lambda p, a: jnp.sum(model.apply({"params": p}, a, train=False)))
        return lambda: float(fwd(v["params"], x))

    import optax

    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.core.train_state import TrainState
    from multimodal_tta_tpu.tta import TentAdapter

    state = TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats=v.get("batch_stats", {}),
        tx=optax.identity(),
    )
    cfg = ConfigNode({"task": {"seed": 0}, "training": {"criterion": {"sigmoid": True}},
                      "tta": {"method": "tent", "steps": 1, "lr": 1e-3, "optimizer": "sgd",
                              "update": "norm", "episodic": True}})
    adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
    ap = adapter.make_adapt_predict_fn(state, threshold=0.3)

    def run():
        _, pred = ap(state, x, x.shape[0])
        pred.block_until_ready()

    return run


def print_top_ops(out_dir: str, top: int = 15) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # ships with the baked-in TF

    paths = glob.glob(os.path.join(out_dir, "plugins/profile/*/*.xplane.pb"))
    if not paths:
        print("no trace found")
        return
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name or "Chip" in plane.name:
            continue
        dur = collections.Counter()
        names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                dur[names.get(ev.metadata_id, "?").split(" = ")[0]] += ev.duration_ps
        print(f"--- {plane.name} (top {top} ops by device time) ---")
        for name, d in dur.most_common(top):
            print(f"  {d / 1e9:9.2f} ms  {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--adapt", action="store_true", help="profile the fused tent adapt+predict step")
    ap.add_argument("--model", default="unet",
                    help="registry model name (unet, unet_ws, unetr, swin_unetr)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/tpu_profile")
    args = ap.parse_args()

    run = build(args.batch, args.adapt, args.model)
    run()  # warm/compile outside the trace
    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        run()
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}")
    print_top_ops(args.out)


if __name__ == "__main__":
    main()
