"""Subprocess worker for tests/test_multihost.py.

Runs ONE process of a 2-process jax.distributed job on the CPU backend
(4 virtual devices per process -> 8 global devices, Gloo cross-process
collectives). Exercises the REAL multi-host code path the single-process
8-device mesh tests cannot: `maybe_initialize_distributed` bring-up,
a global (data x space) mesh spanning both processes, per-process local
batch shards assembled into one global array, and a jitted loss+grad step
whose collectives cross the process boundary. The reference's analogue is
vestigial (torch.distributed guards that are never initialized —
reference: src/core/trainer_base.py:262-272).

Usage: python tests/_mh_worker.py <process_id> <coordinator_port>
Prints one JSON line with the per-process view of the global results; the
parent test asserts both processes agree.
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax

# This image pre-imports jax from sitecustomize, so env vars are too late;
# request the CPU backend and per-process virtual devices programmatically
# before the first backend touch.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    pid = int(sys.argv[1])
    port = int(sys.argv[2])

    from multimodal_tta_tpu.parallel.distributed import (
        is_primary_host,
        maybe_initialize_distributed,
    )

    ok = maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert ok, "maybe_initialize_distributed returned False under explicit args"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid, (jax.process_index(), pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert is_primary_host() == (pid == 0)

    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.core.trainers.seg_trainer import make_criterion
    from multimodal_tta_tpu.models import UNet3D
    from multimodal_tta_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    # data=4 x space=2 global mesh over both processes: the batch axis and
    # the conv halo exchanges both cross the process boundary.
    mesh = make_mesh(jax.devices(), data=4, space=2)

    model = UNet3D(
        in_channels=2,
        num_classes=1,
        channels=(4, 8, 16, 32, 64),
        strides=(2, 2, 2, 2),
        num_res_units=1,
        norm="INSTANCE",
    )
    # Same seed on both processes -> identical params; passed to the jitted
    # step as host numpy, which jit materializes as replicated global arrays.
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 2)), train=True)
    params = jax.tree.map(np.asarray, variables["params"])

    crit_cfg = ConfigNode(
        {"sigmoid": True, "include_background": False, "lambda_dice": 5.0, "lambda_ce": 1.0}
    )
    criterion = make_criterion(crit_cfg)

    # Global batch 8: each process contributes rows [4*pid, 4*pid+4) of a
    # deterministic dataset both processes can construct for the oracle.
    rng = np.random.RandomState(7)
    full_img = rng.randn(8, 16, 16, 16, 2).astype(np.float32)
    full_lbl = (rng.rand(8, 16, 16, 16, 1) > 0.7).astype(np.float32)
    sh = batch_sharding(mesh)
    img = jax.make_array_from_process_local_data(sh, full_img[4 * pid : 4 * pid + 4])
    lbl = jax.make_array_from_process_local_data(sh, full_lbl[4 * pid : 4 * pid + 4])
    assert img.shape == (8, 16, 16, 16, 2), img.shape

    def loss_fn(params, img, lbl):
        logits = model.apply({"params": params}, img, train=False)
        return criterion(logits, lbl)

    rep = replicated(mesh)
    step = jax.jit(
        jax.value_and_grad(loss_fn),
        in_shardings=(rep, sh, sh),
        out_shardings=(rep, rep),
    )
    with mesh:
        loss, grads = step(params, img, lbl)
    gnorm = float(
        np.sqrt(sum(float(jnp.sum(jnp.square(g))) for g in jax.tree.leaves(grads)))
    )
    loss = float(loss)
    assert np.isfinite(loss) and np.isfinite(gnorm) and gnorm > 0.0

    # Single-process oracle on the full batch: the global SPMD loss must
    # match a plain local computation of the same arithmetic.
    local_loss = float(loss_fn(variables["params"], jnp.asarray(full_img), jnp.asarray(full_lbl)))

    # Cross-process agreement: allgather each process's scalar view.
    from jax.experimental import multihost_utils

    all_losses = np.asarray(multihost_utils.process_allgather(jnp.float32(loss)))
    all_gnorms = np.asarray(multihost_utils.process_allgather(jnp.float32(gnorm)))

    print(
        json.dumps(
            {
                "pid": pid,
                "loss": loss,
                "local_oracle_loss": local_loss,
                "gnorm": gnorm,
                "all_losses": all_losses.tolist(),
                "all_gnorms": all_gnorms.tolist(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
