"""Trained-equivalence validation: unet vs unet_ws (VERDICT.md item 3).

Trains both models with the identical recipe on a hard synthetic HECKTOR
fixture (full working shape, 1-3 lesions per case with radii down to 2.5
voxels — small lesions punish the WS variant's half-resolution head) and
compares validation/test Dice plus wall-clock per epoch. Run on the TPU:

    python scripts/validate_unet_ws.py [--epochs 24] [--out results.json]

Prints one JSON line per model and a final verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache  # noqa: E402

apply_platform_env()  # honor JAX_PLATFORMS under sitecustomize pins
enable_compilation_cache()


def ensure_fixture(root: str) -> str:
    manifest = os.path.join(root, "manifest.csv")
    if os.path.exists(manifest):
        return manifest
    from multimodal_tta_tpu.data.synthetic import make_hecktor_fixture

    print("[validate] generating hard fixture ...", file=sys.stderr)
    return make_hecktor_fixture(
        root,
        centers={"CHGJ": 16, "CHUS": 16, "CHUM": 16, "CHUP": 8},
        shape=(144, 144, 48),
        seed=7,
        n_lesions=(1, 3),
        radius_range=(2.5, 9.0),
    )


def run_one(model_name: str, manifest: str, epochs: int, out_root: str) -> dict:
    from _validate_common import bring_up

    overrides = [
        "task=hecktor21",
        "dataset=hecktor21",
        "model=unet",  # group file; the registry name is overridden below
        f"model.name={model_name}",
        f"dataset.manifest_csv={manifest}",
        "dataset.expected_shape=[144,144,48]",
        "dataset.target_center=CHUP",
        "dataset.val_per_center=2",
        "dataset.cache_in_memory=true",  # decode each volume once per process
        f"training.epochs={epochs}",
        "training.batch_size=8",
        "training.eval_batch_size=8",
        "training.num_workers=8",
        "training.optimizer=adam",
        "training.optimizers.adam.lr=1e-3",
        "training.eval_test.start_epoch=0",
        f"training.eval_test.every_n_epochs={max(epochs // 4, 1)}",
        "training.eval_test.run_last=true",
        "training.eval_test.do_test=true",
        "training.model_save_start=9999",
        f"task.save_dir={out_root}",
        f"task.run_name=ws_validate_{model_name}",
    ]
    manager, cfg = bring_up(overrides, tag="validate_ws")
    results = manager.last_train_results
    wall = manager.last_train_wall_s

    evals = results.get("eval_history", [])
    best_val = max((e.get("avg_dc", 0.0) for e in evals), default=0.0)
    final_val = evals[-1].get("avg_dc", 0.0) if evals else 0.0
    return {
        "model": model_name,
        "epochs": epochs,
        "best_val_avg_dc": round(float(best_val), 4),
        "final_val_avg_dc": round(float(final_val), 4),
        "wall_s": round(wall, 1),
        "s_per_epoch": round(wall / max(epochs, 1), 2),
    }


def ensure_brats_fixture(root: str) -> str:
    """Structured multi-region BraTS fixture with SMALL enhancing cores —
    the half-resolution head's worst case (VERDICT r2 weak #7: unet_ws was
    characterized on single-region HECKTOR only; ET is where it should
    hurt)."""
    csv_path = os.path.join(root, "GLIPRE", "processed.csv")
    if os.path.exists(csv_path):
        return csv_path
    from multimodal_tta_tpu.data.synthetic import make_brats_fixture

    print("[validate] generating multi-region BraTS fixture ...", file=sys.stderr)
    csvs = make_brats_fixture(
        root,
        shape=(96, 96, 64),
        seed=7,
        sources={"GLIPRE": {"profile": "gli", "cases": {"train": 28, "test": 8}}},
        n_lesions=(1, 2),
        radius_range=(4.0, 10.0),  # ET core = innermost shell, ~1/3 radius
    )
    return csvs["GLIPRE"]


def run_one_brats(model_name: str, csv_path: str, epochs: int, out_root: str) -> dict:
    from _validate_common import bring_up

    overrides = [
        "task=brats",
        "dataset=brats",
        "model=unet",
        f"model.name={model_name}",
        "model.in_channels=4",
        "model.num_classes=3",
        "dataset.expected_shape=[96,96,64]",
        "training.data.transforms.image_size=[64,96,96]",
        f"training.epochs={epochs}",
        "training.batch_size=4",
        "training.eval_batch_size=4",
        "training.num_workers=8",
        "dataset.cache_in_memory=true",
        "training.optimizer=adam",
        "training.optimizers.adam.lr=1e-3",
        "training.eval_test.start_epoch=0",
        f"training.eval_test.every_n_epochs={max(epochs // 4, 1)}",
        "training.eval_test.run_last=true",
        "training.eval_test.do_test=false",
        "training.model_save_start=9999",
        f"task.save_dir={out_root}",
        f"task.run_name=ws_brats_{model_name}",
    ]

    def mutate(cfg):
        # one source: train on its train split, validate on its test split
        cfg.dataset.sources = [
            {
                "name": "glipre",
                "profile": "gli",
                "csv_path": csv_path,
                "root_dir": None,
                "include_splits": {"train": ["train"], "val": ["test"], "test": []},
            }
        ]

    manager, cfg = bring_up(overrides, mutate_cfg=mutate, tag="validate_ws_brats")
    results = manager.last_train_results
    wall = manager.last_train_wall_s
    evals = results.get("eval_history", [])
    best = max(evals, key=lambda e: e.get("avg_dc", 0.0)) if evals else {}
    return {
        "model": model_name,
        "task": "brats_multi_region",
        "epochs": epochs,
        "best_val_avg_dc": round(float(best.get("avg_dc", 0.0)), 4),
        "et_dc": round(float(best.get("et_dc", 0.0)), 4),
        "tc_dc": round(float(best.get("tc_dc", 0.0)), 4),
        "wt_dc": round(float(best.get("wt_dc", 0.0)), 4),
        "wall_s": round(wall, 1),
        "s_per_epoch": round(wall / max(epochs, 1), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--task", choices=["hecktor", "brats"], default="hecktor")
    ap.add_argument("--fixture", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--models", nargs="+", default=["unet", "unet_ws"])
    args = ap.parse_args()

    fixture = args.fixture or os.path.join(
        REPO_ROOT, ".ws_validate_fixture" if args.task == "hecktor" else ".ws_brats_fixture"
    )
    out_root = os.path.join(fixture, "runs")

    rows = []
    for m in args.models:
        if args.task == "brats":
            r = run_one_brats(m, ensure_brats_fixture(fixture), args.epochs, out_root)
        else:
            r = run_one(m, ensure_fixture(fixture), args.epochs, out_root)
        rows.append(r)
        print(json.dumps(r))

    if len(rows) == 2:
        d = rows[1]["best_val_avg_dc"] - rows[0]["best_val_avg_dc"]
        verdict = {
            "dice_delta_ws_minus_unet": round(d, 4),
            "within_tolerance_0.02": bool(abs(d) <= 0.02 or d > 0),
            "speedup_wall": round(rows[0]["s_per_epoch"] / max(rows[1]["s_per_epoch"], 1e-9), 2),
        }
        if args.task == "brats":
            verdict["et_delta_ws_minus_unet"] = round(rows[1]["et_dc"] - rows[0]["et_dc"], 4)
        print(json.dumps(verdict))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
