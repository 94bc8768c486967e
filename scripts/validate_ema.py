"""Weight-EMA value measurement (training.ema).

Trains arms from the same seed on the synthetic multi-center HECKTOR
fixture: plain (evaluate the live params) vs training.ema at one or more
decays (evaluate the shadow, training.ema.eval=true). The EMA shadow is
PASSIVE — it never feeds gradients — so every arm follows the identical
training trajectory and the comparison isolates exactly one question:
which weights should evaluation/checkpoint-selection read? Classic claim
(Polyak averaging): the shadow smooths SGD noise and wins once per-epoch
progress is noise-dominated, while it LAGS early when every step still
moves in one direction.

    python scripts/validate_ema.py [--epochs 12] [--decays 0.9 0.99] [--out r.json]

Results in BASELINE.md (weight-EMA section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))

from multimodal_tta_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache  # noqa: E402

apply_platform_env()
enable_compilation_cache()


def train_arm(manifest: str, epochs: int, out_root: str, shape, decay):
    """decay=None -> plain arm (no EMA)."""
    from _validate_common import bring_up

    x, y, z = shape
    tag = "plain" if decay is None else f"ema{decay}"
    overrides = [
        "task=hecktor21",
        "dataset=hecktor21",
        "model=unet",
        f"dataset.manifest_csv={manifest}",
        f"dataset.expected_shape=[{x},{y},{z}]",
        f"training.data.transforms.image_size=[{z},{y},{x}]",
        "dataset.target_center=CHUP,CHMR",
        "dataset.val_per_center=2",
        "dataset.cache_in_memory=true",
        f"training.epochs={epochs}",
        "training.batch_size=8",
        "training.eval_batch_size=8",
        "training.num_workers=8",
        "training.device_cache=true",
        "training.optimizer=adam",
        "training.optimizers.adam.lr=1e-3",
        "training.eval_test.start_epoch=0",
        "training.eval_test.every_n_epochs=1",
        "training.eval_test.run_last=true",
        "training.eval_test.do_test=false",
        "training.model_save_start=9999",
        f"task.save_dir={out_root}",
        f"task.run_name=ema_validate_{tag}",
    ]
    if decay is not None:
        overrides += [
            "training.ema.enabled=true",
            f"training.ema.decay={decay}",
            "training.ema.eval=true",
        ]
    manager, cfg = bring_up(overrides, tag=tag)
    return manager


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--decays", type=float, nargs="+", default=[0.9, 0.99])
    ap.add_argument("--fixture", default=os.path.join(REPO_ROOT, ".stream_tta_fixture"))
    ap.add_argument("--shape", type=int, nargs=3, default=[144, 144, 48])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vst", os.path.join(REPO_ROOT, "scripts", "validate_stream_tta.py")
    )
    vst = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vst)
    manifest = vst.ensure_fixture(args.fixture, shape=tuple(args.shape))

    out = {}
    arms = [None] + list(args.decays)
    for decay in arms:
        manager = train_arm(
            manifest, args.epochs, os.path.join(args.fixture, "runs"),
            tuple(args.shape), decay,
        )
        res = manager.last_train_results
        row = {
            "arm": "plain" if decay is None else f"ema_decay={decay}",
            "wall_s": round(manager.last_train_wall_s, 1),
            "val_curve": [
                round(float(e["gtvt_dc"]), 4) for e in res["eval_history"] if "gtvt_dc" in e
            ],
            "train_loss_curve": [round(float(t["loss"]), 4) for t in res["train_history"]],
        }
        row["best_val"] = max(row["val_curve"]) if row["val_curve"] else None
        row["final_val"] = row["val_curve"][-1] if row["val_curve"] else None
        out[row["arm"]] = row
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
