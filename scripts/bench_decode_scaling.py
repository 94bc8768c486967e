"""Host NIfTI-decode throughput: single-core rate, CPU-boundedness, and
thread-pool behavior (VERDICT r2 weak #5).

This box exposes ONE cgroup-limited CPU core (os.sched_getaffinity -> {0}),
so a multi-core thread-scaling curve cannot be measured here. What CAN be
measured, and what the serving-host projection in BASELINE.md must rest on:

  1. the single-core decode rate (volumes/sec) through the exact serving
     path (``load_canonical_dhw``: gzip inflate via libdeflate when present,
     header parse, canonical reorient, [D,H,W] cast),
  2. whether decode is CPU-bound (process-CPU time ~= wall time) — if so,
     host scaling is linear in cores until IO binds and the cores needed to
     saturate one chip is device_rate / single_core_rate, and
  3. that the HostLoader thread pool adds no contention pathology at 1 core
     (threads 1/2/4/8 within noise of each other — inflate releases the
     GIL, so threads interleave instead of fighting).

    python scripts/bench_decode_scaling.py [--cases 24] [--threads 1 2 4 8]

Prints one JSON line per thread count and a summary with the cores-needed
arithmetic for the flagship serving rate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402


def ensure_fixture(root: str, n_cases: int, shape=(144, 144, 48)) -> list:
    """n_cases CT+PT .nii.gz pairs at the HECKTOR serving shape; returns the
    flat file list (2 files per case — what one served volume decodes)."""
    from multimodal_tta_tpu.data import nifti

    os.makedirs(root, exist_ok=True)
    files = []
    rng = np.random.RandomState(0)
    for i in range(n_cases):
        for mod, scale, off in (("ct", 300.0, -100.0), ("pt", 3.0, 1.0)):
            p = os.path.join(root, f"case{i:03d}_{mod}.nii.gz")
            files.append(p)
            if not os.path.exists(p):
                vol = (rng.randn(*shape) * scale + off).astype(np.float32)
                nifti.save(vol, np.eye(4), p)
    return files


def measure(files: list, n_threads: int, repeats: int = 2) -> dict:
    from multimodal_tta_tpu.data.nifti import load_canonical_dhw

    best_wall = None
    cpu_for_best = None
    for _ in range(repeats):
        t0w, t0c = time.perf_counter(), time.process_time()
        if n_threads <= 1:
            for f in files:
                load_canonical_dhw(f)
        else:
            with ThreadPoolExecutor(max_workers=n_threads) as pool:
                list(pool.map(load_canonical_dhw, files))
        wall = time.perf_counter() - t0w
        cpu = time.process_time() - t0c
        if best_wall is None or wall < best_wall:
            best_wall, cpu_for_best = wall, cpu
    n_vols = len(files) / 2  # a served volume = CT + PT
    return {
        "threads": n_threads,
        "volumes_per_sec": round(n_vols / best_wall, 2),
        "files_per_sec": round(len(files) / best_wall, 2),
        "cpu_over_wall": round(cpu_for_best / best_wall, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=24)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--device-rate", type=float, default=45.0,
                    help="chip serving rate (vol/s) for the cores-needed arithmetic")
    ap.add_argument("--fixture", default=os.path.join(REPO_ROOT, ".bench_decode_fixture"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from multimodal_tta_tpu.data._native import available as native_available

    files = ensure_fixture(args.fixture, args.cases)
    n_cores = len(os.sched_getaffinity(0))
    rows = []
    for nt in args.threads:
        row = measure(files, nt)
        rows.append(row)
        print(json.dumps(row))

    single = next((r for r in rows if r["threads"] == 1), rows[0])
    summary = {
        "visible_cores": n_cores,
        "native_decode": bool(native_available()),
        "single_core_volumes_per_sec": single["volumes_per_sec"],
        "cpu_bound": single["cpu_over_wall"] > 0.9,
        "cores_to_saturate_chip": int(np.ceil(args.device_rate / single["volumes_per_sec"])),
        "device_rate_assumed": args.device_rate,
        "note": (
            "1-core cgroup: thread counts >1 must be flat (GIL-released "
            "inflate interleaves, no extra core to use); linear-in-cores "
            "holds while cpu_over_wall ~= 1"
            if n_cores == 1
            else "multi-core box: volumes_per_sec vs threads is the real curve"
        ),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "summary": summary}, f, indent=2)


if __name__ == "__main__":
    main()
