"""Preprocessing throughput benchmark (BASELINE.json config #2, first half).

Times the offline HECKTOR pipeline (scripts/prepare_hecktor21.py: NIfTI read
-> physical-space resample of CT/PET/GT onto the CT grid at target spacing ->
bbox ROI crop -> center pad/crop -> gz write) on synthetic raw cases at
realistic grid sizes, end to end including IO. The reference runs the same
geometry through SimpleITK (reference: scripts/prepare_hecktor21.py:519-637)
single-process on the host CPU; SimpleITK is absent from this image, so the
recorded comparison point is this framework's own XLA pipeline on the host.

    python scripts/bench_preprocess.py [--cases 4] [--backend cpu|default]

Prints one JSON line {"cases": N, "seconds": S, "cases_per_sec": R}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np
import pandas as pd

from multimodal_tta_tpu.data import nifti


def make_raw(root: str, n_cases: int) -> None:
    """Synthetic raw tree at realistic HECKTOR grid sizes: CT 320x320x96 @
    [1.2,1.2,3]mm, PET 128x128x96 @ [4,4,3]mm (coarser grid, so the PET
    resample genuinely regrids)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    rows_b, rows_i = [], []
    for i in range(n_cases):
        pid = f"CHUS{i:03d}"
        ct = (rng.rand(320, 320, 96).astype(np.float32) * 2000) - 1000
        aff_ct = np.diag([1.2, 1.2, 3.0, 1.0])
        nifti.save(ct, aff_ct, os.path.join(root, f"{pid}_ct.nii.gz"))
        pt = np.abs(rng.rand(128, 128, 96)).astype(np.float32) * 10
        aff_pt = np.diag([4.0, 4.0, 3.0, 1.0])
        nifti.save(pt, aff_pt, os.path.join(root, f"{pid}_pt.nii.gz"))
        gt = np.zeros((320, 320, 96), np.uint8)
        gt[140:180, 140:180, 40:60] = 1
        nifti.save(gt, aff_ct, os.path.join(root, f"{pid}_gtvt.nii.gz"))
        rows_b.append({"PatientID": pid, "x1": -260.0, "x2": -100.0,
                       "y1": -260.0, "y2": -100.0, "z1": 60.0, "z2": 204.0})
        rows_i.append({"PatientID": pid, "CenterID": 1})
    pd.DataFrame(rows_b).to_csv(os.path.join(root, "bbox.csv"), index=False)
    pd.DataFrame(rows_i).to_csv(os.path.join(root, "info.csv"), index=False)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=4)
    ap.add_argument("--backend", default="cpu", choices=["cpu", "default"],
                    help="cpu = XLA:CPU (the offline-preprocessing deployment "
                    "shape); default = whatever jax picks (TPU here is behind "
                    "a network tunnel, so H2D dominates and understates it)")
    ap.add_argument("--root", default="/tmp/bench_preprocess")
    args = ap.parse_args()

    raw = os.path.join(args.root, "raw")
    out = os.path.join(args.root, "proc")
    if not os.path.exists(os.path.join(raw, "bbox.csv")):
        print(f"[bench_preprocess] generating {args.cases} raw cases ...", file=sys.stderr)
        make_raw(raw, args.cases)

    import yaml

    cfg = {
        "bbox_csv": os.path.join(raw, "bbox.csv"),
        "info_csv": os.path.join(raw, "info.csv"),
        "nii_root": raw,
        "out_root": out,
        "out_manifest_csv": os.path.join(out, "manifest.csv"),
        "target_spacing": [1.0, 1.0, 3.0],
        "output_size": [144, 144, 48],
        "enable_split": True,
        "seed": 2026,
        "val_per_center": 0,
        "source_centers": ["CHUS"],
        "target_centers": [],
    }
    cfg_path = os.path.join(args.root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    if args.backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    cmd = [sys.executable, os.path.join(REPO_ROOT, "scripts", "prepare_hecktor21.py"),
           "--config", cfg_path, "--mode", "full"]
    # warm run compiles the resampler signatures; timed run measures the
    # steady-state pipeline (the deployment shape: thousands of cases reuse
    # the persistent compile cache)
    subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(1)

    mf = pd.read_csv(os.path.join(out, "manifest.csv"))
    ok = int((mf["status"] == "ok").sum())
    print(json.dumps({"cases": ok, "seconds": round(dt, 2),
                      "cases_per_sec": round(ok / dt, 3),
                      "backend": args.backend}))


if __name__ == "__main__":
    main()
