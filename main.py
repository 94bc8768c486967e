"""CLI entry point.

Same launch grammar as the reference's Hydra entry (reference: main.py:23-52):

    python main.py task=hecktor21 dataset=hecktor21 model=unet \
        training.epochs=300 training.batch_size=8 dataset.target_center=CHUS

Config composition (defaults list, group overrides, dotted value overrides,
run-dir templating + chdir) is provided by the framework's own composer so
the reference's launch scripts run unchanged without external Hydra.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Honor JAX_PLATFORMS even when sitecustomize pre-imports jax and pins a
# platform (the env var is otherwise silently ignored in such images).
from multimodal_tta_tpu.utils.host_alloc import retain_host_memory
from multimodal_tta_tpu.utils.jax_setup import apply_platform_env

apply_platform_env()
retain_host_memory()  # reuse faulted pages on lazily-backed VM hosts

# Multi-device CPU simulation for CLI runs (XLA_FLAGS env vars are too late in
# images where sitecustomize pre-imports jax — set the config programmatically
# before the first backend touch, exactly like tests/conftest.py):
#   MTTA_NUM_CPU_DEVICES=8 python main.py ...
if os.environ.get("MTTA_NUM_CPU_DEVICES"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(os.environ["MTTA_NUM_CPU_DEVICES"]))

from multimodal_tta_tpu.conf import compose, setup_run_dir
from multimodal_tta_tpu.utils.logger import setup_logger


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(os.path.join(REPO_ROOT, "configs"), "config", argv)

    run_dir = setup_run_dir(cfg)
    logger = setup_logger(log_file=os.path.join(run_dir, "train.log"))
    logger.info(f"Run dir: {run_dir}")
    logger.info(f"Running Configs:\n{cfg.to_yaml()}")

    from multimodal_tta_tpu.core import ExperimentManager

    manager = ExperimentManager(cfg)
    manager.setup_model()
    manager.setup_data(mode="train")
    manager.setup_optimizer()
    manager.setup_scheduler()
    manager.setup_trainer(run_dir)

    try:
        manager.train(cfg.training.epochs)
    except Exception as e:
        logger.error(f"[Train] Training failed: {e}")
        raise


if __name__ == "__main__":
    main()
