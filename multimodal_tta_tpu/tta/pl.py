"""Hard pseudo-label test-time adaptation (method "pl").

The PL baseline from the Tent paper (Wang et al., ICLR 2021 compare against
it; the objective is Lee 2013's self-training applied at test time — public
method): adapt the norm-affine parameters by cross-entropy against the
model's OWN hard predictions, restricted to voxels whose prediction
confidence clears ``tta.pl.conf_threshold`` (ops/losses.py
``pseudo_label_loss``). Everything else — the scanned jit, the partitioned
trainable subtree, episodic/continual modes, mesh shardings, early-stop,
restore, reliability gating — is the shared Tent engine; only the objective
differs.

Where it sits vs entropy minimization: PL's confident-voxel gate makes it
ABSTAIN on batches with no confident predictions (loss 0, zero gradient),
where Tent's entropy objective still pushes — a built-in collapse guard, at
the cost of adapting nothing under severe shift. The conf_threshold trades
those off (1.0 = never adapt, 0.5 = every voxel self-trains).

Reference parity: the reference repo has no TTA algorithm (SURVEY.md §0) —
new capability.
"""

from __future__ import annotations

from ..conf.node import ConfigNode
from ..registry import register_tta_method
from ..utils.config import get_config
from .tent import TentAdapter


@register_tta_method("pl")
class PseudoLabelAdapter(TentAdapter):
    """Tent engine with the hard pseudo-label objective."""

    def __init__(self, tta_cfg, config=None, mesh=None, device_transform=None):
        tta_cfg = tta_cfg or ConfigNode()
        tta_cfg.setdefault("loss", "pl")
        loss = str(get_config(tta_cfg, "loss", "pl")).lower()
        if loss.split("+")[0] != "pl":
            raise ValueError(
                f"[pl] tta.loss={loss!r} is not a pseudo-label objective — "
                f"run it as tta.method=tent so results are not mislabeled"
            )
        super().__init__(tta_cfg, config=config, mesh=mesh, device_transform=device_transform)
