"""Demonstrate the decode-side serving claim as a RUN, not arithmetic.

BASELINE's "2 host cores saturate one chip" was derived from a decode-only
microbench (36.9 vol/s/core) against the 45 vol/s device ceiling
(VERDICT r4 weak #1: "the claim still deserves its test"). This harness
runs the two halves TOGETHER: a HostLoader decoding the e2e fixture and the
device-resident fused adapt+segment step consuming batch-for-batch, H2D
deliberately excluded (the tunnel's 10-35 MB/s is infrastructure, not
framework — on a host-attached TPU that term is PCIe-sized; the exclusion
is printed in the artifact).

Three measured phases, one process:

  decode_only   — HostLoader rate at --workers threads (this box: 1 core,
                  so >1 worker timeshares; the per-core rate is the claim's
                  input)
  device_only   — fused online-Tent step on a pre-staged device batch
                  (the 45 vol/s ceiling, re-measured in-session)
  pipelined     — decode batch i+1 while the device runs staged batch i
                  (async dispatch, one result-fenced sync per epoch); rate
                  vs min(decode, device) shows how much of the ideal
                  pipeline this host's client allows (round-3 finding: a
                  busy-polling client starves the loader on a 1-core host)

Verdict line: cores_needed = ceil(device_rate / decode_rate_per_core) and
whether the measured pipeline sustains the device rate when decode capacity
>= device rate.

    python scripts/validate_loader_saturation.py [--workers 2] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import math
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--device-iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from multimodal_tta_tpu.data.hecktor21 import Hecktor21Dataset
    from multimodal_tta_tpu.data.loader import HostLoader
    from multimodal_tta_tpu.utils.host_alloc import retain_host_memory

    retain_host_memory()
    manifest = bench.ensure_e2e_fixture()
    dataset = Hecktor21Dataset(
        manifest, "test", target_center="CHUP",
        expected_shape=(144, 144, 48), transform=None)
    n_cases = len(dataset)

    def make_loader():
        return HostLoader(dataset, batch_size=bench.BATCH, shuffle=False,
                          num_workers=args.workers, prefetch_batches=3)

    # ---- decode-only ------------------------------------------------------
    loader = make_loader()
    for batch in loader:  # warmup epoch: OS page cache + first-touch faults
        pass
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.epochs):
        for batch in loader:
            n += int(batch.get("_n_valid", batch["image"].shape[0]))
    decode_rate = n / (time.perf_counter() - t0)
    row = {"phase": "decode_only", "workers": args.workers,
           "volumes_per_sec": round(decode_rate, 1)}
    print(json.dumps(row), flush=True)

    # ---- device-only (pre-staged, the ceiling) ----------------------------
    state, adapt_predict = bench.build_adapter_state(
        predict_mode="inline", episodic=False)
    checksum = bench._make_checksum()
    rng = np.random.RandomState(0)
    x_staged = jnp.asarray((rng.randn(bench.BATCH, *bench.SHAPE) * 100
                            ).astype(np.float32))
    cur = state
    for _ in range(3):
        cur, pred = adapt_predict(cur, x_staged, bench.BATCH)
        int(checksum(pred))
    t0 = time.perf_counter()
    last = None
    for _ in range(args.device_iters):
        cur, pred = adapt_predict(cur, x_staged, bench.BATCH)
        last = checksum(pred)
    int(last)
    device_rate = bench.BATCH * args.device_iters / (time.perf_counter() - t0)
    print(json.dumps({"phase": "device_only",
                      "volumes_per_sec": round(device_rate, 1)}), flush=True)

    # ---- pipelined: decode i+1 while device consumes staged i -------------
    # The device input stays the pre-staged tensor (H2D excluded, see module
    # docstring) but each device step is gated on its batch having been
    # DECODED — the pipeline advances at min(decode, device) plus whatever
    # interference the host client adds.
    t0 = time.perf_counter()
    n = 0
    last = None
    for _ in range(args.epochs):
        for batch in loader:
            nv = int(batch.get("_n_valid", batch["image"].shape[0]))
            cur, pred = adapt_predict(cur, x_staged, bench.BATCH)  # async
            last = checksum(pred)
            n += nv
    int(last)  # one fence at the end: decode and compute both complete
    pipe_rate = n / (time.perf_counter() - t0)
    print(json.dumps({"phase": "pipelined", "workers": args.workers,
                      "volumes_per_sec": round(pipe_rate, 1),
                      "h2d_excluded": True}), flush=True)

    host_cores = os.cpu_count() or 1
    per_core = decode_rate / min(args.workers, host_cores)
    cores_needed = math.ceil(device_rate / per_core) if per_core > 0 else None
    print(json.dumps({
        "verdict": "loader_saturation",
        "n_cases": n_cases,
        "host_cores": host_cores,
        "decode_rate_per_core": round(per_core, 1),
        "device_rate": round(device_rate, 1),
        "cores_needed_to_saturate_chip": cores_needed,
        "pipelined_over_ideal": round(
            pipe_rate / min(decode_rate, device_rate), 3),
        "note": ("H2D excluded (tunneled-dev H2D is infrastructure-bound; "
                 "see BASELINE e2e section for measured tunnel rates)"),
    }), flush=True)


if __name__ == "__main__":
    main()
