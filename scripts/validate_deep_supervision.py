"""Deep-supervision value measurement (model.deep_supervision).

Trains two arms from the same seed on the synthetic multi-center HECKTOR
fixture — plain UNet vs deep_supervision=2 — evaluating EVERY epoch in the
unsaturated regime (the 24-epoch fixture run saturates at val Dice 0.96,
where any comparison is ceiling noise). Deep supervision's classic claim
(nnU-Net family, PAPERS.md) is better gradient flow => faster convergence;
this prints the per-epoch val-Dice curve for both arms plus the final test
score so the claim is measured, not assumed, on this framework's flagship.

    python scripts/validate_deep_supervision.py [--epochs 8] [--out r.json]

Results in BASELINE.md (deep-supervision section).
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


def train_arm(manifest: str, epochs: int, out_root: str, ds: int, shape):
    from _validate_common import bring_up

    x, y, z = shape
    overrides = [
        "task=hecktor21",
        "dataset=hecktor21",
        "model=unet",
        f"model.deep_supervision={ds}",
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
        f"task.run_name=ds_validate_{ds}",
    ]
    manager, cfg = bring_up(overrides, tag=f"ds{ds}")
    return manager, cfg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--ds", type=int, default=2)
    ap.add_argument("--fixture", default=os.path.join(REPO_ROOT, ".stream_tta_fixture"))
    ap.add_argument("--shape", type=int, nargs=3, default=[144, 144, 48])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # reuse the streaming fixture (same generator; created if absent)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vst", os.path.join(REPO_ROOT, "scripts", "validate_stream_tta.py")
    )
    vst = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vst)
    manifest = vst.ensure_fixture(args.fixture, shape=tuple(args.shape))

    out = {}
    for ds in (0, args.ds):
        manager, _cfg = train_arm(
            manifest, args.epochs, os.path.join(args.fixture, "runs"), ds, tuple(args.shape)
        )
        res = manager.last_train_results
        row = {
            "deep_supervision": ds,
            "wall_s": round(manager.last_train_wall_s, 1),
            # eval runs every epoch (index == epoch); empty dicts are epochs
            # the cadence skipped
            "val_curve": [
                round(float(e["gtvt_dc"]), 4) for e in res["eval_history"] if "gtvt_dc" in e
            ],
            "train_loss_curve": [
                round(float(t["loss"]), 4) for t in res["train_history"]
            ],
        }
        out[f"ds{ds}"] = row
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
