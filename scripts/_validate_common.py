"""Shared bring-up for the validation/benchmark harness scripts.

The three validate_* scripts (unet_ws trained-equivalence, HECKTOR
scanner-shift TTA, BraTS missing-modality TTA) compose a config, build an
ExperimentManager through the same setup chain, train or resume, and
evaluate TTA configurations through the engine. That sequence lives here so
a change to the manager bring-up contract (e.g. the round-2 donated-state
sync) lands once.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable, Optional, Sequence

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def bring_up(
    overrides: Sequence[str],
    *,
    resume: Optional[str] = None,
    mutate_cfg: Optional[Callable] = None,
    log_name: str = "train.log",
    tag: str = "validate",
):
    """Compose -> run dir -> manager setup chain -> train (or load resume).

    Returns (manager, cfg). ``mutate_cfg(cfg)`` runs after composition for
    edits dotted overrides can't express (e.g. list-valued dataset.sources).
    """
    from multimodal_tta_tpu.conf import compose, setup_run_dir
    from multimodal_tta_tpu.core import ExperimentManager
    from multimodal_tta_tpu.utils.logger import setup_logger

    if resume:
        # setup_run_dir chdirs into the run directory; a cwd-relative
        # checkpoint path silently stops resolving there (measured failure
        # mode twice in round 4) — pin it before the chdir
        resume = os.path.abspath(str(resume))
    cfg = compose(os.path.join(REPO_ROOT, "configs"), "config", list(overrides))
    if mutate_cfg is not None:
        mutate_cfg(cfg)
    run_dir = setup_run_dir(cfg)
    setup_logger(log_file=os.path.join(run_dir, log_name))

    manager = ExperimentManager(cfg)
    manager.setup_model()
    manager.setup_data(mode="train")
    manager.setup_optimizer()
    manager.setup_scheduler()
    manager.setup_trainer(run_dir)

    if resume:
        from multimodal_tta_tpu.core.checkpoint import load_checkpoint

        manager.state, _ = load_checkpoint(str(resume), manager.state)
        print(f"[{tag}] loaded source checkpoint {resume}", file=sys.stderr)
        return manager, cfg

    # epoch count comes from cfg ONLY: schedulers/eval cadence/save gates are
    # all derived from cfg.training.epochs, so a separate epochs argument
    # could silently train past the configured schedule
    n_epochs = int(cfg.training.epochs)
    t0 = time.perf_counter()
    results = manager.train(n_epochs)
    wall = time.perf_counter() - t0
    print(f"[{tag}] source training {wall:.0f}s", file=sys.stderr)
    # stash for callers that report on the training run itself (unet_ws
    # trained-equivalence); the manager API doesn't otherwise retain these
    manager.last_train_results = results
    manager.last_train_wall_s = wall
    return manager, cfg


def device_transform_of(manager, split: str = "test"):
    """The builder's on-device transform spec for ``split`` (or None)."""
    builder = manager._builder
    if hasattr(builder, "build_transform"):
        t = builder.build_transform(split)
        if t is not None and hasattr(t, "device_spec"):
            return t.device_spec()
    return None


def engine_eval(manager, cfg, loader, device_transform, tta_over: dict):
    """Evaluate ``loader`` through the TTA engine under one tta config;
    returns the seg_eval metric dict."""
    from multimodal_tta_tpu.tta import TTAEngine

    c = cfg.copy()
    c.tta = tta_over
    engine = TTAEngine(c, mesh=manager.mesh, device_transform=device_transform)
    with manager.mesh:
        return engine.evaluate(manager.state, loader)
