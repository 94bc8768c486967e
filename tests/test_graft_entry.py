"""Regression coverage for the driver entry points (__graft_entry__.py).

Round-1 failure (VERDICT.md item 1): the deferred step-metric sync changed
SegTrainer.run_step to return {} on the first step, breaking
dryrun_multichip's metrics["loss"] read. These tests pin (a) the documented
run_step/flush_step_metrics contract in-process and (b) the driver's exact
subprocess invocation of dryrun_multichip(8).
"""

import os
import subprocess
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_step_metrics_contract():
    """run_step returns the previous step's loss ({} on step 1); the pending
    loss is always recoverable via flush_step_metrics()."""
    import jax
    import jax.numpy as jnp

    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.core.optim import build_optimizer
    from multimodal_tta_tpu.core.train_state import TrainState
    from multimodal_tta_tpu.core.trainers.seg_trainer import SegTrainer
    from multimodal_tta_tpu.models import UNet3D

    cfg = ConfigNode(
        {
            "task": {"seed": 0},
            "training": {
                "optimizer": "adam",
                "optimizers": {"adam": {"lr": 1e-3}},
                "criterion": {"sigmoid": True},
            },
        }
    )
    model = UNet3D(
        in_channels=1, num_classes=1, channels=(2, 4), strides=(2,), num_res_units=1
    )
    x0 = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=True)
    tx, _ = build_optimizer(cfg.training, variables["params"])
    trainer = SegTrainer(cfg, mesh=None)
    trainer.state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(2, 8, 8, 8, 1).astype(np.float32),
        "label": (rng.rand(2, 8, 8, 8, 1) > 0.5).astype(np.float32),
    }

    first = trainer.run_step(batch)
    assert first == {}  # loss sync deferred by one step
    drained = trainer.flush_step_metrics()
    assert np.isfinite(drained["loss"])
    assert trainer.flush_step_metrics() == {}  # drained exactly once

    second = trainer.run_step(batch)
    assert second == {}  # pending was flushed, so deferral restarts
    third = trainer.run_step(batch)
    assert np.isfinite(third["loss"])  # previous step's loss
    assert np.isfinite(trainer.flush_step_metrics()["loss"])


def test_dryrun_multichip_driver_path():
    """Run the driver's multi-chip proof exactly as the driver does: a fresh
    subprocess executing __graft_entry__.py, 8 virtual CPU devices."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "__graft_entry__.py"), "8"],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout[-2000:]
