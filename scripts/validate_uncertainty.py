"""Uncertainty-map triage validation: does `mean_uncert_in_pred` rank cases?

predict.save_uncertainty exports per-voxel mirror-ensemble disagreement and a
per-case `mean_uncert_in_pred` scalar whose stated purpose is triage —
"uncertain predictions rank for human review first" (evaluation/export.py).
That is a measurable claim. The reference has no prediction export at all
(its masks die on device, reference src/evaluation/seg_eval.py:239-399), so
there is no reference number; this harness creates the evidence:

  1. Reuse the scanner-shift fixture + trained source UNet from
     validate_tta.py (CHUP test center carries a simulated scanner shift;
     source-center val cases are in-domain).
  2. Export predictions WITH flip-TTA + uncertainty for both splits
     (no adaptation — triage is a pre-adaptation serving signal).
  3. Score each exported mask against the fixture GT (per-case Dice) and
     test the claim three ways:
       - Spearman rank correlation of mean_uncert_in_pred vs case Dice
         (the claim predicts negative rho);
       - triage recall@k: reviewing the k most-uncertain cases, what
         fraction of the k worst-Dice cases get caught (k = n//4);
       - population separation: shifted-center mean uncertainty vs
         in-domain mean uncertainty.

    python scripts/validate_uncertainty.py [--epochs 24] [--out r.json]

Prints one JSON row per case population and a verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
if SCRIPTS_DIR not in sys.path:
    sys.path.insert(0, SCRIPTS_DIR)

from multimodal_tta_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache  # noqa: E402

apply_platform_env()
enable_compilation_cache()

import numpy as np  # noqa: E402


def export_split(manifest: str, ckpt: str, split: str, out_dir: str,
                 flip_axes, eval_batch: int):
    """Drive the real predict.py CLI path (compose -> exporter) for a split."""
    import predict as predict_cli

    overrides = [
        "task=hecktor21",
        "dataset=hecktor21",
        "model=unet",
        f"dataset.manifest_csv={manifest}",
        "dataset.expected_shape=[144,144,48]",
        "dataset.target_center=CHUP",
        "dataset.val_per_center=2",
        f"training.eval_batch_size={eval_batch}",
        "training.num_workers=4",
        f"training.resume={ckpt}",
        "evaluation.flip_tta.enable=true",
        f"evaluation.flip_tta.axes=[{','.join(str(a) for a in flip_axes)}]",
        "predict.save_uncertainty=true",
        f"predict.split={split}",
        f"predict.out_dir={out_dir}",
        f"task.save_dir={os.path.dirname(out_dir)}",
        f"task.run_name=uncert_{split}",
    ]
    return predict_cli.main(overrides)


def case_dice(manifest_rows, pred_dir: str, case_id: str) -> float:
    from multimodal_tta_tpu.data import nifti

    gt_path = manifest_rows[case_id]
    gt = nifti.load_canonical(gt_path) > 0.5
    pred = nifti.load_canonical(os.path.join(pred_dir, f"{case_id}_pred.nii.gz")) > 0.5
    inter = float(np.logical_and(gt, pred).sum())
    denom = float(gt.sum() + pred.sum())
    return 2.0 * inter / denom if denom else 1.0


def spearman(x, y) -> float:
    """Spearman rho via rank-transformed Pearson (average ranks on ties)."""
    def ranks(v):
        v = np.asarray(v, dtype=np.float64)
        order = np.argsort(v, kind="mergesort")
        r = np.empty(len(v))
        r[order] = np.arange(1, len(v) + 1)
        # average tied ranks
        for val in np.unique(v):
            m = v == val
            if m.sum() > 1:
                r[m] = r[m].mean()
        return r

    rx, ry = ranks(x), ranks(y)
    rx -= rx.mean()
    ry -= ry.mean()
    denom = np.sqrt((rx ** 2).sum() * (ry ** 2).sum())
    return float((rx * ry).sum() / denom) if denom else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24,
                    help="source-training epochs if no cached checkpoint")
    ap.add_argument("--flip-axes", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--eval-batch", type=int, default=8)
    ap.add_argument("--fixture", default=os.path.join(REPO_ROOT, ".tta_validate_fixture"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from validate_tta import ensure_fixture, train_source

    manifest = ensure_fixture(args.fixture)
    ckpt = os.path.join(args.fixture, "runs", "source_ckpt")
    if not os.path.exists(ckpt + ".msgpack"):
        print("[validate_uncertainty] no cached source model - training", file=sys.stderr)
        manager, _ = train_source(manifest, args.epochs,
                                  os.path.join(args.fixture, "runs"))
        from multimodal_tta_tpu.core.checkpoint import save_checkpoint

        save_checkpoint(ckpt, manager.state)

    import csv

    with open(manifest, newline="") as f:
        gt_of = {r["patient_id"]: r["gtvt_proc"] for r in csv.DictReader(f)}

    out_root = os.path.join(args.fixture, "uncert_validate")
    populations = {}
    for split, tag in (("test", "shifted_CHUP"), ("val", "in_domain_val")):
        out_dir = os.path.join(out_root, split)
        rows = export_split(manifest, ckpt, split, out_dir,
                            args.flip_axes, args.eval_batch)
        cases = []
        for r in rows:
            d = case_dice(gt_of, out_dir, r["case_id"])
            cases.append({"case_id": r["case_id"], "dice": round(d, 4),
                          "uncert": round(float(r["mean_uncert_in_pred"]), 5)})
        populations[tag] = cases

    report = {"populations": {}, "verdict": {}}
    pooled = []
    for tag, cases in populations.items():
        dice = np.array([c["dice"] for c in cases])
        unc = np.array([c["uncert"] for c in cases])
        pooled.extend(cases)
        row = {
            "n": len(cases),
            "mean_dice": round(float(dice.mean()), 4),
            "mean_uncert": round(float(unc.mean()), 5),
            "spearman_uncert_vs_dice": round(spearman(unc, dice), 3),
            "cases": cases,
        }
        report["populations"][tag] = row
        print(json.dumps({"population": tag, **{k: v for k, v in row.items() if k != "cases"}}))

    dice = np.array([c["dice"] for c in pooled])
    unc = np.array([c["uncert"] for c in pooled])
    n = len(pooled)
    k = max(n // 4, 1)
    worst = set(np.argsort(dice)[:k].tolist())          # k lowest-Dice cases
    flagged = set(np.argsort(-unc)[:k].tolist())        # k most-uncertain cases
    recall_at_k = len(worst & flagged) / k
    sep = (report["populations"]["shifted_CHUP"]["mean_uncert"]
           / max(report["populations"]["in_domain_val"]["mean_uncert"], 1e-12))
    verdict = {
        "pooled_n": n,
        "pooled_spearman": round(spearman(unc, dice), 3),
        "triage_k": k,
        "triage_recall_at_k": round(recall_at_k, 3),
        "shifted_over_indomain_uncert_ratio": round(float(sep), 2),
        "claim_holds": bool(spearman(unc, dice) < -0.3 and recall_at_k >= 0.5),
    }
    report["verdict"] = verdict
    print(json.dumps({"verdict": verdict}))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"[validate_uncertainty] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
