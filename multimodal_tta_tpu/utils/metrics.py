"""Running-average meters and seeding.

``AverageMeter`` matches the reference utility (reference:
src/utils/metrics.py:10-34). ``set_random_seed`` keeps the same 3-mode
signature (reference: src/utils/metrics.py:36-81) but maps the determinism
presets onto the JAX/XLA world: JAX programs are deterministic by construction
for a fixed PRNG key on fixed hardware, so "off"/"practical"/"strict" only
control host-side RNGs and XLA determinism flags.
"""

from __future__ import annotations

import os
import random

import numpy as np


class AverageMeter:
    """Tracks a running sum/count/average of a scalar series."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1) -> None:
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += int(n)
        self.avg = self.sum / max(1, self.count)


def set_random_seed(seed: int, deterministic: str = "practical"):
    """Seed host RNGs and return a root jax.random.PRNGKey.

    Modes (mirroring the reference's presets):
      - "off":        seed host RNGs only.
      - "practical":  + deterministic XLA reductions left at defaults (TPU
                      compute under jit is already run-to-run deterministic
                      for fixed shapes/keys).
      - "strict":     + request deterministic XLA ops via flags (may disable
                      some fast paths).
    """
    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed)

    mode = str(deterministic).lower()
    if mode not in ("off", "practical", "strict"):
        raise ValueError(f"Unknown deterministic mode: {deterministic}")

    if mode == "strict":
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_gpu_deterministic_ops" not in flags:
            # harmless on TPU; relevant if this code ever runs on GPU backends
            os.environ["XLA_FLAGS"] = (flags + " --xla_gpu_deterministic_ops=true").strip()

    import jax

    return jax.random.PRNGKey(seed)
