"""Benchmark harness.

Headline metric (BASELINE.json): volumes adapted+segmented per second per
chip — each volume gets one Tent TTA adaptation step (entropy backward on
norm params) plus a segmentation forward, on the HECKTOR21 working shape
[48,144,144] x 2 channels (CT/PET) with the full-size UNet3D (channels
[32,64,128,256,512], ~31M params equivalent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the same workload executed on one CPU host
device — the reference implementation is CPU-bound torch/MONAI which cannot
run in this environment (monai is not installed), so the CPU-JAX path is the
stand-in reference baseline; it is measured once and cached in
.bench_cpu_baseline.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# stdout must carry exactly one JSON line; route framework logs to stderr
from multimodal_tta_tpu.utils.logger import setup_logger as _setup_logger  # noqa: E402
import logging as _logging  # noqa: E402

_log = _setup_logger(to_console=False)
_h = _logging.StreamHandler(sys.stderr)
_log.addHandler(_h)

from multimodal_tta_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

CPU_CACHE = os.path.join(REPO_ROOT, ".bench_cpu_baseline.json")

SHAPE = (48, 144, 144, 2)  # D,H,W,C — HECKTOR21 working shape
BATCH = int(os.environ.get("BENCH_BATCH", "8"))


def _parse_remat(v: str):
    v = v.strip().lower()
    if v in ("true", "1", "yes"):
        return True
    if v in ("false", "0", "no"):
        return False
    return int(v)


def build_workload():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.core.train_state import TrainState
    from multimodal_tta_tpu.models import UNet3D
    from multimodal_tta_tpu.tta import TentAdapter
    import optax

    model = UNet3D(
        in_channels=2,
        num_classes=1,
        channels=(32, 64, 128, 256, 512),
        strides=(2, 2, 2, 2),
        num_res_units=2,
        norm="INSTANCE",
        act="RELU",
        dtype=jnp.bfloat16,
        remat=_parse_remat(os.environ.get("BENCH_REMAT", "false")),
    )
    x0 = jnp.zeros((BATCH,) + SHAPE, jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(jax.random.PRNGKey(0), x0)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=optax.identity(),
    )

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
                "episodic": True,
            },
        }
    )
    adapter = TentAdapter(cfg.tta, config=cfg, mesh=None)
    # adapt + segment fused into ONE jitted dispatch (threshold 0.3, the
    # HECKTOR eval threshold)
    adapt_predict = adapter.make_adapt_predict_fn(state, threshold=0.3)

    rng = np.random.RandomState(0)
    x_np = (rng.randn(BATCH, *SHAPE) * 100).astype(np.float32)
    x = jnp.asarray(x_np)

    def run_once():
        _, pred = adapt_predict(state, x, BATCH)
        pred.block_until_ready()
        return pred

    return run_once


def measure(iters: int, warmup: int = 2) -> float:
    """Returns volumes/sec for the adapt+segment workload."""
    run_once = build_workload()
    for _ in range(warmup):
        run_once()
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = time.perf_counter() - t0
    return BATCH * iters / dt


def cpu_baseline() -> float:
    if os.path.exists(CPU_CACHE):
        with open(CPU_CACHE) as f:
            return float(json.load(f)["volumes_per_sec"])
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_MODE"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    vps = float(json.loads(line)["volumes_per_sec"])
    with open(CPU_CACHE, "w") as f:
        json.dump({"volumes_per_sec": vps}, f)
    return vps


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "accel")
    if mode == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        vps = measure(iters=2, warmup=1)
        print(json.dumps({"volumes_per_sec": vps}))
        return

    import jax

    n_chips = len(jax.devices())
    vps = measure(iters=10, warmup=3)
    per_chip = vps / max(1, n_chips) if jax.devices()[0].platform != "cpu" else vps

    try:
        base = cpu_baseline()
    except Exception as e:
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)
        base = None

    result = {
        "metric": "volumes adapted+segmented/sec/chip (HECKTOR21 48x144x144x2, UNet3D-32..512, tent 1 step)",
        "value": round(per_chip, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(per_chip / base, 2) if base else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
