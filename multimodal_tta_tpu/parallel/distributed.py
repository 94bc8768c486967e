"""Multi-host initialization.

The reference's torch.distributed guards are vestigial (never initialized —
reference: src/core/trainer_base.py:262-272). Here multi-host is first-class
but zero-config: when launched under a multi-host TPU runtime (JobSet/GKE/
gcloud set the coordinator env vars) ``maybe_initialize_distributed`` brings
up jax.distributed so ``jax.devices()`` spans the slice; collectives then ride
ICI within the slice and DCN across hosts exactly as annotated by the mesh.
Single-host runs are untouched.
"""

from __future__ import annotations

import os
from typing import Optional

from ..utils.logger import get_logger

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when a multi-host launch is detected or
    explicit parameters are given. Returns True when running multi-host."""
    global _INITIALIZED
    logger = get_logger()
    if _INITIALIZED:
        return True

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (int(env_np) if env_np else None)
    process_id = process_id if process_id is not None else (int(env_pid) if env_pid else None)

    # TPU pod runtimes auto-detect everything via the metadata server; the
    # presence of MEGASCALE/TPU worker env vars signals a multi-host launch.
    auto_detect = any(
        os.environ.get(k)
        for k in ("MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES_OVERRIDE")
    )

    if coordinator_address is None and not auto_detect:
        return False

    import jax

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
        _INITIALIZED = True
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}, "
            f"{len(jax.devices())} global devices"
        )
        return True
    except Exception as e:  # pragma: no cover - environment dependent
        logger.warning(f"jax.distributed initialization failed: {e}; continuing single-host")
        return False


def is_primary_host() -> bool:
    import jax

    try:
        return jax.process_index() == 0
    except Exception:
        return True
