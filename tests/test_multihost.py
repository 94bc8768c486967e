"""True multi-process (multi-host) distributed bring-up test.

Everything else in tests/ simulates a pod with ONE process owning 8 virtual
CPU devices; this test runs TWO OS processes (4 devices each) joined by
``jax.distributed`` over a localhost coordinator, so the mesh's data axis and
the space axis's conv halo exchanges genuinely cross a process boundary
(Gloo collectives — the CPU stand-in for DCN). It is the only place the
``maybe_initialize_distributed`` bring-up path actually executes; the
reference's torch.distributed guards are vestigial and never initialized
(reference: src/core/trainer_base.py:262-272).

Serialized world: this box exposes a single CPU core, so the two workers
timeshare it — the timeout is generous, and the test runs nothing else
concurrently.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "_mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_step():
    port = _free_port()
    env = dict(os.environ)
    # The workers pick backend/devices via jax.config.update (sitecustomize
    # pre-imports jax); scrub the single-process test env so the coordinator
    # vars of THIS pytest process don't leak in.
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}\n{out[-1000:]}"
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    r0, r1 = sorted(outs, key=lambda r: r["pid"])
    # Both processes computed the same global loss/grad-norm from the same
    # global SPMD computation...
    assert r0["loss"] == pytest.approx(r1["loss"], abs=1e-6)
    assert r0["gnorm"] == pytest.approx(r1["gnorm"], rel=1e-5)
    # ...the allgather round-trip agrees with the local scalars...
    assert np.allclose(r0["all_losses"], [r0["loss"], r1["loss"]], atol=1e-6)
    assert np.allclose(r0["all_gnorms"], r1["all_gnorms"], rtol=1e-5)
    # ...and the distributed loss matches each process's single-host oracle
    # on the identical full batch (fp32 conv reassociation tolerance).
    assert r0["loss"] == pytest.approx(r0["local_oracle_loss"], abs=5e-5)
    assert r1["loss"] == pytest.approx(r1["local_oracle_loss"], abs=5e-5)
