"""Prediction-export entry point: segment a split and write NIfTI masks.

The reference has no inference driver — its eval path computes metrics and
discards the masks (reference: src/evaluation/seg_eval.py:239-399). This CLI
completes the serving story: load a checkpoint, stream a split, optionally
TTA-adapt per batch, and write every case's segmentation back into its
source NIfTI grid, plus a predictions.csv provenance manifest.

    python predict.py task=hecktor21 dataset=hecktor21 model=unet \
        training.resume=outputs/.../checkpoints/best_model \
        dataset.target_center=CHUS tta=tent tta.steps=4 tta.lr=0.05 \
        predict.save_prob=true

Config surface (all optional):
  predict.split     split to export (default "test")
  predict.out_dir   output directory (default <run_dir>/predictions)
  predict.save_prob also write float32 probability volumes (default false)
  predict.save_uncertainty  also write per-voxel mirror-ensemble
                    disagreement (std) volumes + a per-case
                    mean_uncert_in_pred triage column; requires
                    evaluation.flip_tta.enable=true (default false)
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.conf import compose, setup_run_dir
from multimodal_tta_tpu.utils.host_alloc import retain_host_memory
from multimodal_tta_tpu.utils.jax_setup import apply_platform_env
from multimodal_tta_tpu.utils.logger import setup_logger

apply_platform_env()  # honor JAX_PLATFORMS even under a sitecustomize pin
retain_host_memory()  # reuse faulted pages on lazily-backed VM hosts


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(os.path.join(REPO_ROOT, "configs"), "config", argv)

    run_dir = setup_run_dir(cfg)
    logger = setup_logger(log_file=os.path.join(run_dir, "predict.log"))
    logger.info(f"Run dir: {run_dir}")

    from multimodal_tta_tpu.core import ExperimentManager
    from multimodal_tta_tpu.core.checkpoint import load_checkpoint
    from multimodal_tta_tpu.evaluation.export import PredictionExporter
    from multimodal_tta_tpu.tta import TTAEngine
    from multimodal_tta_tpu.utils.config import get_config

    manager = ExperimentManager(cfg)
    manager.setup_model()
    manager.setup_optimizer()

    split = str(get_config(cfg, "predict.split", "test")).lower()
    if split == "test":
        loader = manager.setup_test_data()
    else:
        manager.setup_data("train")
        loader = {"train": manager.train_loader, "val": manager.val_loader}[split]
    if loader is None:
        raise ValueError(f"predict.split='{split}' has no data under this config")

    resume = get_config(cfg, "training.resume", None)
    if resume:
        manager.state, _ = load_checkpoint(str(resume), manager.state)
        logger.info(f"Loaded checkpoint: {resume}")
        from multimodal_tta_tpu.core.checkpoint import resolve_serving_params

        use_ema = bool(get_config(cfg, "training.use_ema_params", False))
        manager.state = resolve_serving_params(manager.state, use_ema)
        if use_ema:
            logger.info("Exporting predictions from the EMA shadow weights")
    else:
        logger.warning("No training.resume checkpoint given — exporting from a RANDOM-init model")

    builder = manager._builder
    device_transform = None
    if hasattr(builder, "build_transform"):
        device_transform = builder.build_transform(split).device_spec()

    engine = TTAEngine(cfg, mesh=manager.mesh, device_transform=device_transform)
    adapt_fn = None
    carry = False
    if engine.adapter is not None:
        logger.info(f"Exporting WITH TTA method '{engine.method}' "
                    f"({'episodic' if engine.episodic else 'continual'})")
        adapt_fn = engine.adapter.make_adapt_fn(manager.state)
        carry = not engine.episodic

    out_dir = str(get_config(cfg, "predict.out_dir", os.path.join(run_dir, "predictions")))
    exporter = PredictionExporter(
        engine.strategy,
        out_dir,
        save_prob=bool(get_config(cfg, "predict.save_prob", False)),
        save_uncertainty=bool(get_config(cfg, "predict.save_uncertainty", False)),
        logger=logger,
    )
    with manager.mesh:
        rows = exporter.run(
            manager.state, loader, mesh=manager.mesh, adapt_fn=adapt_fn, carry_state=carry
        )
    logger.info(f"Wrote {len(rows)} cases to {out_dir}")
    return rows


if __name__ == "__main__":
    main()
