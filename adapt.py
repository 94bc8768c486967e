"""Test-time adaptation + evaluation entry point.

The reference has no TTA driver (its main.py only trains); this is the
framework's TTA CLI, sharing the training CLI's config grammar:

    python adapt.py task=hecktor21 dataset=hecktor21 model=unet tta=tent \
        tta.steps=2 training.resume=outputs/.../checkpoints/best_model \
        dataset.target_center=CHUS

Loads a (trained) checkpoint, streams the test split, runs the configured TTA
method per batch (episodic or continual), and reports the seg_eval metric
dict overall and per domain — with and without adaptation when
``tta.report_no_adapt=true``.
"""

from __future__ import annotations

import json
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
    logger = setup_logger(log_file=os.path.join(run_dir, "adapt.log"))
    logger.info(f"Run dir: {run_dir}")
    logger.info(f"TTA Configs:\n{cfg.to_yaml()}")

    from multimodal_tta_tpu.core import ExperimentManager
    from multimodal_tta_tpu.core.checkpoint import load_checkpoint
    from multimodal_tta_tpu.tta import TTAEngine
    from multimodal_tta_tpu.utils.config import get_config

    manager = ExperimentManager(cfg)
    manager.setup_model()
    test_loader = manager.setup_test_data()
    manager.setup_optimizer()

    resume = get_config(cfg, "training.resume", None)
    if resume:
        manager.state, _ = load_checkpoint(str(resume), manager.state)
        logger.info(f"Loaded checkpoint: {resume}")
        from multimodal_tta_tpu.core.checkpoint import resolve_serving_params

        use_ema = bool(get_config(cfg, "training.use_ema_params", False))
        manager.state = resolve_serving_params(manager.state, use_ema)
        if use_ema:
            logger.info("Serving/adapting the EMA shadow weights")
    else:
        logger.warning("No training.resume checkpoint given — adapting a RANDOM-init model")

    builder = manager._builder
    device_transform = None
    if hasattr(builder, "build_transform"):
        device_transform = builder.build_transform("test").device_spec()

    engine = TTAEngine(cfg, mesh=manager.mesh, device_transform=device_transform)

    results = {}
    if bool(get_config(cfg, "tta.report_no_adapt", False)):
        logger.info("Evaluating WITHOUT adaptation (source model)...")
        with manager.mesh:
            no_adapt = engine.strategy.evaluate_epoch(manager.state, test_loader, manager.mesh)
        results["no_adapt"] = no_adapt
        logger.info(f"[no-adapt] {no_adapt}")

    if bool(get_config(cfg, "tta.stream.enabled", False)):
        # streaming protocol (BASELINE config #5): ordered domain stream
        # through StreamTTAController (reset policy + collapse guard)
        from multimodal_tta_tpu.tta.stream import StreamTTAController, evaluate_stream

        if engine.adapter is None:
            raise ValueError("tta.stream.enabled requires a TTA method (tta=tent)")
        thr = float(get_config(cfg, "evaluation.seg.threshold", 0.5))
        ctrl = StreamTTAController.from_config(
            engine.adapter, manager.state, cfg, threshold=thr
        )
        order = get_config(cfg, "tta.stream.domain_order", None)
        if order:
            stream = (
                (dom, batch)
                for dom in order
                for batch in builder.get_loader("test", target_center=str(dom))
            )
        else:
            stream = (
                (batch.get("domain", ["?"])[0], batch) for batch in test_loader
            )
        logger.info(
            f"Streaming TTA: policy={ctrl.policy} guard={ctrl.guard} "
            f"order={list(order) if order else 'test-split order'}"
        )
        with manager.mesh:
            adapted = evaluate_stream(ctrl, stream)
        logger.info(
            f"[stream] avg_dc={adapted['avg_dc']} reanchors={adapted['reanchors']} "
            + " ".join(f"{k}={v}" for k, v in adapted.items() if k.startswith("dom/"))
        )
    else:
        logger.info(f"Evaluating with TTA method '{engine.method}'...")
        with manager.mesh:
            adapted = engine.evaluate(manager.state, test_loader)
        logger.info(f"[adapted] {adapted}")
    results["adapted"] = adapted

    out_path = os.path.join(run_dir, "tta_metrics.json")
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=2)
    logger.info(f"Metrics written to {out_path}")
    return results


if __name__ == "__main__":
    main()
