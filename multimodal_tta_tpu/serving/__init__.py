"""Ahead-of-time serving export (jax.export / StableHLO artifacts).

The reference has no deployment story at all — its serving surface is the
eval loop of a live torch process (reference: src/evaluation/seg_eval.py).
Here the fused adapt+segment step (or a plain forward) is exported as a
self-contained, versioned StableHLO artifact that a deployment runtime can
execute with NO model code, NO flax/optax, and NO checkpoint loader — see
``serving/export.py``.
"""

from .export import (
    ServingArtifact,
    export_adapt_serving,
    export_forward_serving,
    load_artifact,
    save_artifact,
)

__all__ = [
    "ServingArtifact",
    "export_adapt_serving",
    "export_forward_serving",
    "load_artifact",
    "save_artifact",
]
