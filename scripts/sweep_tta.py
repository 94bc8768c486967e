"""Multi-case parallel TTA sweep (BASELINE.json config #4).

The reference's analogue is a bash GPU pool running 5 independent
leave-one-center-out processes (reference: train_hecktor21_parellel.sh:56-172).
The TPU-native version runs the whole sweep in ONE process over ONE device
mesh: for each target center, the held-out center's cases stream through the
shared jitted tent-adapt + eval step data-parallel over the mesh — no
process pool, no per-job recompilation (the step is compiled once and reused
across all five sweeps since shapes are identical).

    python scripts/sweep_tta.py task=hecktor21 dataset=hecktor21 model=unet \
        tta=tent training.resume=<ckpt-without-extension>

Writes sweep_metrics.json: {target_center: seg_eval metric dict}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.conf import compose, setup_run_dir
from multimodal_tta_tpu.utils.jax_setup import apply_platform_env
from multimodal_tta_tpu.utils.logger import setup_logger

apply_platform_env()  # honor JAX_PLATFORMS under sitecustomize pins


DEFAULT_CENTERS = ["CHUS", "CHUM", "CHGJ", "CHMR", "CHUP"]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    centers = DEFAULT_CENTERS
    # per-center wall budget before the sweep declares the accelerator
    # client wedged and exits with a diagnosis (stale-suspended-client
    # failure mode, BASELINE.md); 0 disables
    dispatch_deadline = 900.0
    rest = []
    for tok in argv:
        if tok.startswith("sweep.centers="):
            import yaml

            centers = [str(c) for c in yaml.safe_load(tok.split("=", 1)[1])]
        elif tok.startswith("sweep.dispatch_deadline="):
            dispatch_deadline = float(tok.split("=", 1)[1])
        else:
            rest.append(tok)

    cfg = compose(os.path.join(REPO_ROOT, "configs"), "config", rest)
    run_dir = setup_run_dir(cfg)
    logger = setup_logger(log_file=os.path.join(run_dir, "sweep.log"))
    logger.info(f"TTA sweep over target centers: {centers}")

    from multimodal_tta_tpu.core import ExperimentManager
    from multimodal_tta_tpu.core.checkpoint import load_checkpoint
    from multimodal_tta_tpu.tta import TTAEngine
    from multimodal_tta_tpu.utils.config import get_config

    manager = ExperimentManager(cfg)
    manager.setup_model()
    manager.setup_optimizer()

    resume = get_config(cfg, "training.resume", None)
    if resume:
        manager.state, _ = load_checkpoint(str(resume), manager.state)
        logger.info(f"Loaded checkpoint: {resume}")

    builder = manager.get_dataset_builder_for_task()
    device_transform = None
    if hasattr(builder, "build_transform"):
        device_transform = builder.build_transform("test").device_spec()

    engine = TTAEngine(cfg, mesh=manager.mesh, device_transform=device_transform)

    from multimodal_tta_tpu.utils.watchdog import DispatchWatchdog

    results = {}
    n_total_cases = 0
    t0 = time.perf_counter()
    # one watchdog across the sweep, heartbeat per completed center: a
    # wedged tunnel (stale suspended client) blocks evaluate() forever
    # with no exception — diagnose-and-exit instead of hanging the sweep
    with manager.mesh, DispatchWatchdog(
        dispatch_deadline,
        what="per-center TTA evaluation (sweep_tta)",
        # the first center bears the one-time jit compile on top of its
        # evaluation — give it extra allowance instead of misdiagnosing a
        # legitimately slow compile as a wedge
        first_deadline_s=dispatch_deadline * 2.0 if dispatch_deadline else 0.0,
    ) as watchdog:
        for center in centers:
            logger.info(f"=== target_center={center} ===")
            ds = builder.build_dataset("test", target_center=center)
            loader = builder.get_loader("test", dataset=ds)
            n_total_cases += len(ds)
            # dataset build is host-side progress; only the device-facing
            # evaluation below should consume the dispatch deadline
            watchdog.touch()
            metrics = engine.evaluate(manager.state, loader)
            results[center] = metrics
            logger.info(f"[{center}] avg_dc={metrics.get('avg_dc'):.4f}")
            watchdog.heartbeat()
            # flush after every center: a later-center wedge (watchdog exit)
            # must not discard completed centers' metrics
            partial = os.path.join(run_dir, "sweep_metrics.json")
            tmp = partial + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump({"centers": results, "partial": True}, f, indent=2)
            os.replace(tmp, partial)
    dt = time.perf_counter() - t0

    summary = {
        "centers": results,
        "mean_avg_dc": sum(m.get("avg_dc", 0.0) for m in results.values()) / max(1, len(results)),
        "total_cases": n_total_cases,
        "wall_seconds": dt,
        "cases_per_second": n_total_cases / dt if dt > 0 else None,
    }
    out = os.path.join(run_dir, "sweep_metrics.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2)
    logger.info(
        f"Sweep done: {n_total_cases} cases in {dt:.1f}s "
        f"({summary['cases_per_second']:.2f} cases/s) -> {out}"
    )
    return summary


if __name__ == "__main__":
    main()
