"""HECKTOR21 offline preprocessing.

CLI-compatible port of the reference pipeline (reference:
scripts/prepare_hecktor21.py:411-709) with SimpleITK replaced by this
framework's XLA resampler (multimodal_tta_tpu.ops.resample) and nibabel by
its NIfTI codec:

  python scripts/prepare_hecktor21.py --config scripts/configs/hecktor21.yaml \
      --mode {full,split_only}

Per patient: CT -> fixed spacing (linear, pad -1024); PET/GT -> CT grid
(linear / nearest); physical bbox -> index ROI (8-corner, flip-robust);
out-of-bounds pad; ROI crop; center pad/crop to output_size; cast; write
.nii.gz; append a provenance row (raw/resampled sizes & spacings, bbox, ROI,
pads, status) to manifest.csv. Errors are captured per case as
``status=error:<type>`` rows and processing continues (the reference's
failure-isolation pattern, lines 681-694).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

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
    bbox_mm_to_index_roi,
    crop_image,
    pad_image,
    resample_to_reference,
    resample_to_spacing,
)


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f)


def ensure_dir(p: Path) -> None:
    p.mkdir(parents=True, exist_ok=True)


def patient_center_code(patient_id: str) -> str:
    m = re.match(r"^([A-Za-z]{4})", patient_id)
    return m.group(1).upper() if m else "UNK"


def read_image(path: Path) -> Tuple[np.ndarray, Grid]:
    img = nifti.load(str(path))
    data = np.asarray(img.get_fdata(np.float32))
    grid = Grid.from_ras_affine(img.affine, data.shape[:3])
    return data, grid


def write_image(path: Path, data: np.ndarray, grid: Grid, dtype) -> None:
    nifti.save(data.astype(dtype), grid.to_ras_affine(), str(path))


# -----------------------------
# Split logic
# -----------------------------
def assign_splits(
    df: pd.DataFrame,
    enable_split: bool,
    source_centers: List[str],
    target_centers: List[str],
    val_per_center: int,
    seed: int,
    other_policy: str,
) -> pd.DataFrame:
    """Stamp ``domain`` and ``split`` columns onto the manifest frame.

    The split PROTOCOL is a data contract with the reference pipeline
    (reference: scripts/prepare_hecktor21.py:274-329): target centers are
    test in full; source centers are train with ``val_per_center`` cases per
    center held out to val by seeded sampling; unlisted centers follow
    ``other_policy`` ("source" / "target" / anything else = drop). Only the
    np.RandomState CONSUMPTION ORDER is pinned for bit-exact split parity
    (SURVEY §7.3 hard-part 6): one RandomState(seed), source centers walked
    in sorted order, one replace=False draw of min(val_per_center, n) per
    center — ``choice`` consumes purely as a function of population size, so
    matching order and sizes reproduces the reference splits exactly
    (regression-locked by tests/test_resample_preprocess.py goldens).
    """
    out = df.copy()
    if not enable_split:
        out["domain"] = "all"
        out["split"] = "train"
        return out

    src = {str(c).upper() for c in source_centers}
    tgt = {str(c).upper() for c in target_centers}
    policy = str(other_policy).lower().strip()
    fallback = policy if policy in ("source", "target") else "ignore"

    upper = out["center_code"].astype(str).str.upper()
    out["domain"] = np.where(
        upper.isin(src), "source", np.where(upper.isin(tgt), "target", fallback)
    )
    out["split"] = out["domain"].map({"source": "train", "target": "test", "ignore": "ignore"})

    rng = np.random.RandomState(seed)
    for _, group in out[out["domain"] == "source"].groupby("center_code", sort=True):
        k = min(int(val_per_center), len(group))
        chosen = rng.choice(group.index.to_numpy(), size=k, replace=False)
        out.loc[chosen, "split"] = "val"
    return out


def compute_center_pad_crop_params(cur_size, target_size):
    """Center-aligned pad/crop params (reference: 211-243)."""
    cur = np.asarray(cur_size, int)
    tgt = np.asarray(target_size, int)
    diff = tgt - cur
    pad_before = np.zeros(3, int)
    pad_after = np.zeros(3, int)
    crop_lower = np.zeros(3, int)
    crop_upper = np.zeros(3, int)
    for d in range(3):
        if diff[d] >= 0:
            pad_before[d] = diff[d] // 2
            pad_after[d] = diff[d] - pad_before[d]
        else:
            cut = -diff[d]
            crop_lower[d] = cut // 2
            crop_upper[d] = cut - crop_lower[d]
    return pad_before.tolist(), pad_after.tolist(), crop_lower.tolist(), crop_upper.tolist()


def apply_center_pad_crop(data, grid, target_size, pad_value, pad_before, pad_after, crop_lower, crop_upper):
    """Crop then pad to reach target_size (reference: 246-268)."""
    if any(v > 0 for v in crop_lower) or any(v > 0 for v in crop_upper):
        size = [int(s - lo - hi) for s, lo, hi in zip(data.shape, crop_lower, crop_upper)]
        data, grid = crop_image(data, grid, crop_lower, size)
    if any(v > 0 for v in pad_before) or any(v > 0 for v in pad_after):
        data, grid = pad_image(data, grid, pad_before, pad_after, pad_value)
    if list(data.shape) != [int(x) for x in target_size]:
        raise RuntimeError(
            f"[pad/crop] failed to reach target_size={target_size}, got={list(data.shape)}"
        )
    return data, grid


def pad_if_needed(data, grid, start_idx, roi_size, pad_value):
    """Pad so the ROI fits inside the image (reference: 168-204)."""
    img_size = np.asarray(data.shape, int)
    start = np.asarray(start_idx, int)
    size = np.asarray(roi_size, int)
    end = start + size - 1

    pad_before = np.maximum(-start, 0)
    pad_after = np.maximum(end - (img_size - 1), 0)
    if np.any(pad_before > 0) or np.any(pad_after > 0):
        data, grid = pad_image(data, grid, pad_before.tolist(), pad_after.tolist(), pad_value)
        new_start = (start + pad_before).tolist()
        dbg = {
            "padded": True,
            "pad_before": pad_before.tolist(),
            "pad_after": pad_after.tolist(),
        }
        return data, grid, new_start, dbg
    return data, grid, list(start_idx), {"padded": False, "pad_before": [0, 0, 0], "pad_after": [0, 0, 0]}


# -----------------------------
# split-only manifest
# -----------------------------
def case_file_layout(pid: str, nii_root: Path, out_root: Path, ct_suffix: str, pt_suffix: str, gt_suffix: str):
    """(raw, processed) path dicts for one case, keyed by modality. The
    filename patterns (``<pid>_ct.nii.gz`` under images/, ``<pid>_gtvt`` under
    labels/) and suffix handling are the on-disk contract shared with the
    reference pipeline's outputs."""
    raw = {
        "ct": nii_root / f"{pid}{ct_suffix}",
        "pt": nii_root / f"{pid}{pt_suffix}",
        "gtvt": nii_root / f"{pid}{gt_suffix}",
    }
    proc = {
        "ct": out_root / "images" / f"{pid}_ct.nii.gz",
        "pt": out_root / "images" / f"{pid}_pt.nii.gz",
        "gtvt": out_root / "labels" / f"{pid}_gtvt.nii.gz",
    }
    return raw, proc


def build_manifest_csv_only(df, nii_root, out_root, out_manifest_csv, export_per_domain_csv, ct_suffix, pt_suffix, gt_suffix):
    """``--mode split_only``: emit the manifest (raw paths, expected processed
    paths, existence-checked status) without reading a single voxel. Column
    schema is the contract data/hecktor21.py consumes (reference:
    scripts/prepare_hecktor21.py:335-405)."""
    for d in (out_root / "images", out_root / "labels", out_manifest_csv.parent):
        ensure_dir(d)

    rows = []
    for _, r in df.iterrows():
        if "ignore" in (str(r.get("split", "")), str(r.get("domain", ""))):
            continue
        pid = str(r["PatientID"])
        raw, proc = case_file_layout(pid, nii_root, out_root, ct_suffix, pt_suffix, gt_suffix)
        row = {
            "patient_id": pid,
            "center_code": str(r["center_code"]),
            "center_id": r.get("CenterID", None),
            "domain": str(r.get("domain", "")),
            "split": str(r.get("split", "")),
            "status": "ok" if all(p.exists() for p in raw.values()) else "missing_file",
        }
        row.update({f"{m}_raw": str(p) for m, p in raw.items()})
        row.update({f"{m}_proc": str(p) for m, p in proc.items()})
        rows.append(row)

    df_out = pd.DataFrame(rows)
    df_out.to_csv(out_manifest_csv, index=False)
    if export_per_domain_csv and len(df_out) > 0:
        for dom, name in (("source", "source.csv"), ("target", "target.csv")):
            sub = df_out[df_out["domain"] == dom]
            if len(sub) > 0:
                sub.to_csv(out_manifest_csv.with_name(name), index=False)
    return df_out


def process_case(pid, r, cfg_geo, paths) -> Dict[str, Any]:
    """Full geometry pipeline for one patient; returns the manifest row."""
    ct_path, pt_path, gt_path, img_out_dir, lab_out_dir = paths
    x1, x2 = float(r["x1"]), float(r["x2"])
    y1, y2 = float(r["y1"]), float(r["y2"])
    z1, z2 = float(r["z1"]), float(r["z2"])

    ct_raw, ct_grid_raw = read_image(ct_path)
    pt_raw, pt_grid_raw = read_image(pt_path)
    gt_raw, gt_grid_raw = read_image(gt_path)

    # 1) CT -> fixed spacing (reference grid)
    ct, ct_grid = resample_to_spacing(
        ct_raw, ct_grid_raw, cfg_geo["target_spacing"],
        method=cfg_geo["interp_ct"], default_value=cfg_geo["pad_value_ct"],
    )
    # 2) PET/GT -> CT grid
    pt, _ = resample_to_reference(
        pt_raw, pt_grid_raw, ct_grid, method=cfg_geo["interp_pt"],
        default_value=cfg_geo["pad_value_pt"],
    )
    gt, _ = resample_to_reference(
        gt_raw, gt_grid_raw, ct_grid, method=cfg_geo["interp_mask"],
        default_value=cfg_geo["pad_value_mask"],
    )
    pt_grid = ct_grid
    gt_grid = ct_grid

    # 3) bbox(mm) -> index ROI
    start_idx, roi_size, dbg_roi = bbox_mm_to_index_roi(ct_grid, x1, x2, y1, y2, z1, z2)

    # 4) pad if needed, 5) crop
    ct_p, ct_g, start_use, dbg_pad_ct = pad_if_needed(ct, ct_grid, start_idx, roi_size, cfg_geo["pad_value_ct"])
    pt_p, pt_g, _, _ = pad_if_needed(pt, pt_grid, start_idx, roi_size, cfg_geo["pad_value_pt"])
    gt_p, gt_g, _, _ = pad_if_needed(gt, gt_grid, start_idx, roi_size, cfg_geo["pad_value_mask"])

    ct_c, ct_g = crop_image(ct_p, ct_g, start_use, roi_size)
    pt_c, pt_g = crop_image(pt_p, pt_g, start_use, roi_size)
    gt_c, gt_g = crop_image(gt_p, gt_g, start_use, roi_size)
    crop_size = list(ct_c.shape)

    # 6) center pad/crop to fixed output size
    out_size = cfg_geo["output_size"]
    pb, pa, cl, cu = compute_center_pad_crop_params(crop_size, out_size)
    ct_o, ct_g = apply_center_pad_crop(ct_c, ct_g, out_size, cfg_geo["pad_value_ct"], pb, pa, cl, cu)
    pt_o, pt_g = apply_center_pad_crop(pt_c, pt_g, out_size, cfg_geo["pad_value_pt"], pb, pa, cl, cu)
    gt_o, gt_g = apply_center_pad_crop(gt_c, gt_g, out_size, cfg_geo["pad_value_mask"], pb, pa, cl, cu)

    # 7-8) cast + write
    ct_out = img_out_dir / f"{pid}_ct.nii.gz"
    pt_out = img_out_dir / f"{pid}_pt.nii.gz"
    gt_out = lab_out_dir / f"{pid}_gtvt.nii.gz"
    write_image(ct_out, ct_o, ct_g, cfg_geo["save_float_dtype"])
    write_image(pt_out, pt_o, pt_g, cfg_geo["save_float_dtype"])
    write_image(gt_out, np.rint(gt_o), gt_g, cfg_geo["save_mask_dtype"])

    return {
        "status": "ok",
        "ct_proc": str(ct_out),
        "pt_proc": str(pt_out),
        "gtvt_proc": str(gt_out),
        "ct_size_raw": ",".join(map(str, ct_grid_raw.size)),
        "ct_spacing_raw": ",".join(f"{x:.6f}" for x in ct_grid_raw.spacing),
        "pt_size_raw": ",".join(map(str, pt_grid_raw.size)),
        "pt_spacing_raw": ",".join(f"{x:.6f}" for x in pt_grid_raw.spacing),
        "ct_size_resampled": ",".join(map(str, ct_grid.size)),
        "ct_spacing_resampled": ",".join(f"{x:.6f}" for x in ct_grid.spacing),
        "bbox_x1": x1, "bbox_x2": x2,
        "bbox_y1": y1, "bbox_y2": y2,
        "bbox_z1": z1, "bbox_z2": z2,
        "roi_start_idx": ",".join(map(str, dbg_roi["start_idx"])),
        "roi_end_idx": ",".join(map(str, dbg_roi["end_idx"])),
        "roi_size_idx": ",".join(map(str, dbg_roi["roi_size"])),
        "pad_ct_before": ",".join(map(str, dbg_pad_ct["pad_before"])),
        "pad_ct_after": ",".join(map(str, dbg_pad_ct["pad_after"])),
        "crop_size_before_fix": ",".join(map(str, crop_size)),
        "final_output_size": ",".join(map(str, out_size)),
        "final_spacing": ",".join(f"{x:.6f}" for x in cfg_geo["target_spacing"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="Path to YAML config.")
    ap.add_argument("--mode", choices=["full", "split_only"], default="full")
    ap.add_argument("--workers", type=int, default=1,
                    help="Thread-pool width for the per-case pipeline. Cases "
                         "are independent; the geometry core is XLA:CPU (GIL "
                         "released during execution) and the gzip codec "
                         "releases the GIL too, so throughput scales with "
                         "cores until disk IO binds (decode thread-scaling "
                         "measured in BASELINE.md). Output is bit-identical "
                         "to --workers 1 (tested), manifest row order "
                         "preserved. The reference pipeline is single-process "
                         "only (reference: scripts/prepare_hecktor21.py:519).")
    args = ap.parse_args()

    cfg = load_yaml(args.config)

    nii_root = Path(cfg["nii_root"])
    out_root = Path(cfg["out_root"])
    out_manifest_csv = Path(cfg["out_manifest_csv"])
    export_per_domain_csv = bool(cfg.get("export_per_domain_csv", False))

    ts = cfg.get("target_spacing", [1.0, 1.0, 3.0])
    cfg_geo = {
        "target_spacing": (float(ts[0]), float(ts[1]), float(ts[2])),
        "output_size": [int(x) for x in cfg.get("output_size", cfg.get("target_size", [144, 144, 48]))],
        "pad_value_ct": float(cfg.get("pad_value_ct", -1024.0)),
        "pad_value_pt": float(cfg.get("pad_value_pt", 0.0)),
        "pad_value_mask": float(cfg.get("pad_value_mask", 0.0)),
        "interp_ct": str(cfg.get("interp_ct", "linear")),
        "interp_pt": str(cfg.get("interp_pt", "linear")),
        "interp_mask": str(cfg.get("interp_mask", "nearest")),
        "save_float_dtype": np.dtype(str(cfg.get("save_float_dtype", "float32"))),
        "save_mask_dtype": np.dtype(str(cfg.get("save_mask_dtype", "uint8"))),
    }

    ct_suffix = cfg.get("ct_suffix", "_ct.nii.gz")
    pt_suffix = cfg.get("pt_suffix", "_pt.nii.gz")
    gt_suffix = cfg.get("gt_suffix", "_gtvt.nii.gz")

    img_out_dir = out_root / "images"
    lab_out_dir = out_root / "labels"
    ensure_dir(img_out_dir)
    ensure_dir(lab_out_dir)
    ensure_dir(out_manifest_csv.parent)

    df_bbox = pd.read_csv(cfg["bbox_csv"])
    required = ["PatientID", "x1", "x2", "y1", "y2", "z1", "z2"]
    missing = [c for c in required if c not in df_bbox.columns]
    if missing:
        raise RuntimeError(f"bbox_csv missing columns: {missing}. Found: {list(df_bbox.columns)}")

    df_info = pd.read_csv(cfg["info_csv"])
    for c in ("PatientID", "CenterID"):
        if c not in df_info.columns:
            raise RuntimeError(f"info_csv missing '{c}'. Found: {list(df_info.columns)}")

    df = pd.merge(df_bbox, df_info, on="PatientID", how="inner")
    df["center_code"] = df["PatientID"].apply(patient_center_code)
    df = assign_splits(
        df,
        enable_split=bool(cfg.get("enable_split", False)),
        source_centers=cfg.get("source_centers", []),
        target_centers=cfg.get("target_centers", []),
        val_per_center=int(cfg.get("val_per_center", 5)),
        seed=int(cfg.get("seed", 2026)),
        other_policy=cfg.get("other_centers_policy", "ignore"),
    )

    if args.mode == "split_only":
        df_out = build_manifest_csv_only(
            df, nii_root, out_root, out_manifest_csv, export_per_domain_csv,
            ct_suffix, pt_suffix, gt_suffix,
        )
        print(f"[SPLIT_ONLY DONE] merged_rows={len(df)}, exported_rows={len(df_out)}")
        print(f"[MANIFEST] {out_manifest_csv}")
        return

    # Stage the per-case work first (skip/missing rows resolve immediately,
    # heavy cases become tasks), then execute the tasks — serially or on a
    # thread pool. Manifest row order follows the merged CSV either way, and
    # the per-case error-capture contract is unchanged: a crash becomes a
    # status row, never a lost run.
    pending: List[Any] = []  # (slot index into rows, pid, r, paths)
    rows: List[Optional[Dict[str, Any]]] = []
    n_skipped = 0
    for _, r in df.iterrows():
        pid = str(r["PatientID"])
        base = {
            "patient_id": pid,
            "center_code": str(r["center_code"]),
            "center_id": r.get("CenterID", None),
            "domain": str(r.get("domain", "")),
            "split": str(r.get("split", "")),
        }
        if base["split"] == "ignore" or base["domain"] == "ignore":
            n_skipped += 1
            continue

        raw, _ = case_file_layout(pid, nii_root, out_root, ct_suffix, pt_suffix, gt_suffix)
        ct_path, pt_path, gt_path = raw["ct"], raw["pt"], raw["gtvt"]
        raw_paths = {f"{m}_raw": str(p) for m, p in raw.items()}

        if not all(p.exists() for p in raw.values()):
            rows.append({**base, "status": "missing_file", **raw_paths})
            n_skipped += 1
            continue

        rows.append(None)  # slot filled by the task below
        pending.append(
            (len(rows) - 1, pid, r, base, raw_paths,
             (ct_path, pt_path, gt_path, img_out_dir, lab_out_dir))
        )

    def run_task(task) -> None:
        slot, pid, r, base, raw_paths, paths = task
        try:
            row = process_case(pid, r, cfg_geo, paths)
            rows[slot] = {**base, **raw_paths, **row}
        except Exception as e:
            rows[slot] = {
                **base, "status": f"error:{type(e).__name__}",
                "error_msg": str(e), **raw_paths,
            }

    workers = max(int(args.workers), 1)
    if workers > 1 and len(pending) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(tqdm(ex.map(run_task, pending), total=len(pending),
                      desc=f"Preprocessing HECKTOR2021 (x{workers})"))
    else:
        for task in tqdm(pending, desc="Preprocessing HECKTOR2021"):
            run_task(task)
    rows = [x for x in rows if x is not None]
    n_done = sum(1 for x in rows if x.get("status") == "ok")
    n_skipped += sum(1 for x in rows if x.get("status", "").startswith("error:"))

    df_out = pd.DataFrame(rows)
    df_out.to_csv(out_manifest_csv, index=False)
    if export_per_domain_csv and len(df_out) > 0:
        for dom, name in (("source", "source.csv"), ("target", "target.csv")):
            sub = df_out[df_out["domain"] == dom]
            if len(sub) > 0:
                sub.to_csv(out_manifest_csv.with_name(name), index=False)

    print(f"[DONE] processed={n_done}, skipped={n_skipped}, total_in_merged_csv={len(df)}")
    print(f"[MANIFEST] {out_manifest_csv}")


if __name__ == "__main__":
    main()
