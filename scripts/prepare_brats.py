"""BraTS offline preprocessing.

The reference assumes BraTS volumes were preprocessed externally into
per-source ``processed.csv`` manifests (reference: src/datasets/brats.py:13-17
"assumes OFFLINE preprocessing already unified spacing/shape"; no script is
shipped). This completes the data story: it walks a raw BraTS-layout tree
(one directory per case containing ``<case>-<mod>.nii.gz`` + ``<case>-seg.nii.gz``),
resamples everything to a fixed spacing on the first modality's grid with the
framework's XLA resampler, center pads/crops to a fixed output size, writes
processed volumes, and emits the ``processed.csv`` manifest the BraTS dataset
consumes (columns subject_id/modality/img_path/label_path/split).

    python scripts/prepare_brats.py --config scripts/configs/brats.yaml
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path
from typing import Any, Dict, List

import numpy as np
import pandas as pd
import yaml
from tqdm import tqdm

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.utils.jax_setup import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORMS even under a sitecustomize pin

from multimodal_tta_tpu.data import nifti
from multimodal_tta_tpu.ops.resample import (
    Grid,
    crop_image,
    pad_image,
    resample_to_reference,
    resample_to_spacing,
)
from prepare_hecktor21 import (  # reuse geometry helpers
    apply_center_pad_crop,
    compute_center_pad_crop_params,
    ensure_dir,
    load_yaml,
    read_image,
    write_image,
)


def assign_split(case_id: str, rng: np.random.RandomState, ratios) -> str:
    r = rng.rand()
    if r < ratios[0]:
        return "train"
    if r < ratios[0] + ratios[1]:
        return "val"
    return "test"


def process_case(case_dir: Path, cfg: Dict[str, Any], out_img: Path, out_lab: Path):
    case = case_dir.name
    mods = [str(m).lower() for m in cfg.get("modalities", ["t1n", "t1c", "t2w", "t2f"])]
    seg_suffix = cfg.get("seg_suffix", "-seg.nii.gz")
    spacing = tuple(float(x) for x in cfg.get("target_spacing", [1.0, 1.0, 1.0]))
    out_size = [int(x) for x in cfg.get("output_size", [160, 192, 160])]
    pad_img = float(cfg.get("pad_value_image", 0.0))
    pad_msk = float(cfg.get("pad_value_mask", 0.0))

    # 1) reference grid: first modality resampled to target spacing
    ref_path = case_dir / f"{case}-{mods[0]}.nii.gz"
    ref_data, ref_grid_raw = read_image(ref_path)
    ref_data, ref_grid = resample_to_spacing(
        ref_data, ref_grid_raw, spacing, method="linear", default_value=pad_img
    )

    vols = {mods[0]: (ref_data, ref_grid)}
    for m in mods[1:]:
        d, g = read_image(case_dir / f"{case}-{m}.nii.gz")
        d, g = resample_to_reference(d, g, ref_grid, method="linear", default_value=pad_img)
        vols[m] = (d, g)

    seg_path = case_dir / f"{case}{seg_suffix}"
    seg, seg_grid = read_image(seg_path)
    seg, seg_grid = resample_to_reference(
        seg, seg_grid, ref_grid, method="nearest", default_value=pad_msk
    )

    # 2) center pad/crop all to the fixed output size
    pb, pa, cl, cu = compute_center_pad_crop_params(list(ref_data.shape), out_size)
    rows = []
    for m, (d, g) in vols.items():
        d2, g2 = apply_center_pad_crop(d, g, out_size, pad_img, pb, pa, cl, cu)
        p = out_img / f"{case}_{m}.nii.gz"
        write_image(p, d2, g2, np.float32)
        rows.append((m, str(p)))
    seg2, sg2 = apply_center_pad_crop(seg, seg_grid, out_size, pad_msk, pb, pa, cl, cu)
    lab_p = out_lab / f"{case}_seg.nii.gz"
    write_image(lab_p, np.rint(seg2), sg2, np.uint8)
    return rows, str(lab_p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--workers", type=int, default=1,
                    help="Thread-pool width for the per-case pipeline "
                         "(geometry core is XLA:CPU with the GIL released; "
                         "output bit-identical to --workers 1). Split "
                         "assignment stays serial — its RNG-consumption "
                         "order pins the splits.")
    args = ap.parse_args()
    cfg = load_yaml(args.config)

    raw_root = Path(cfg["raw_root"])
    out_root = Path(cfg["out_root"])
    out_img = out_root / "images"
    out_lab = out_root / "labels"
    ensure_dir(out_img)
    ensure_dir(out_lab)

    ratios = cfg.get("split_ratios", [0.8, 0.1, 0.1])
    rng = np.random.RandomState(int(cfg.get("split_seed", 42)))

    case_dirs = sorted(p for p in raw_root.iterdir() if p.is_dir())
    # splits FIRST, serially — assign_split consumes the seeded RNG once per
    # case in sorted order, and that consumption order is the split contract
    splits = [assign_split(d.name, rng, ratios) for d in case_dirs]

    def run_case(item) -> List[Dict[str, Any]]:
        case_dir, split = item
        try:
            mod_rows, lab_p = process_case(case_dir, cfg, out_img, out_lab)
            return [
                {
                    "subject_id": case_dir.name,
                    "modality": m,
                    "img_path": img_p,
                    "label_path": lab_p,
                    "split": split,
                    "status": "ok",
                }
                for m, img_p in mod_rows
            ]
        except Exception as e:
            return [
                {
                    "subject_id": case_dir.name,
                    "modality": "",
                    "img_path": "",
                    "label_path": "",
                    "split": split,
                    "status": f"error:{type(e).__name__}",
                }
            ]

    work = list(zip(case_dirs, splits))
    workers = max(int(args.workers), 1)
    if workers > 1 and len(work) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            per_case = list(tqdm(ex.map(run_case, work), total=len(work),
                                 desc=f"Preprocessing BraTS (x{workers})"))
    else:
        per_case = [run_case(w) for w in tqdm(work, desc="Preprocessing BraTS")]

    rows: List[Dict[str, Any]] = [r for case_rows in per_case for r in case_rows]
    n_done = sum(1 for cr in per_case if cr and cr[0]["status"] == "ok")
    n_err = len(per_case) - n_done

    out_csv = out_root / "processed.csv"
    pd.DataFrame(rows).to_csv(out_csv, index=False)
    print(f"[DONE] cases={n_done}, errors={n_err}")
    print(f"[MANIFEST] {out_csv}")


if __name__ == "__main__":
    main()
