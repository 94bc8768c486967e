"""EATA: efficient anti-forgetting test-time adaptation (method "eata").

Niu et al., "Efficient Test-Time Model Adaptation without Forgetting"
(ICML 2022 — public method). Both halves already live in the Tent engine
as composable knobs; this method name turns them ON together with the
paper's framing:

  1. **Sample-adaptive gating** (``tta.reliability``) — samples whose
     self-normalized entropy exceeds ``margin_ratio * H_max`` contribute
     nothing; the rest are weighted ``exp(margin - e)``
     (tent.py ``reliability_weights``). The paper's second, redundancy
     filter is deliberately omitted — tent.py documents why (it serializes
     batches against host state).
  2. **Fisher anti-forgetting** (``tta.fisher``) — a diagonal-Fisher
     quadratic anchor toward the source model, estimated on the first
     served batches (tent.py ``_build_fisher_step``); parameters the source
     objective is sensitive to are held tight, sloppy directions stay free
     to adapt.

This subclass only fills those defaults and validates that at least one
EATA mechanism stays enabled (both off would silently degenerate to plain
Tent under an "eata" label — the mislabeled-results failure mode).
Reference parity: the reference repo has no TTA algorithm (SURVEY.md §0) —
new capability.
"""

from __future__ import annotations

from ..conf.node import ConfigNode
from ..registry import register_tta_method
from ..utils.config import get_config
from .tent import TentAdapter


@register_tta_method("eata")
class EataAdapter(TentAdapter):
    """Tent engine with both EATA mechanisms on by default."""

    def __init__(self, tta_cfg, config=None, mesh=None, device_transform=None):
        tta_cfg = tta_cfg or ConfigNode()
        rel = tta_cfg.setdefault("reliability", ConfigNode())
        rel.setdefault("enabled", True)
        fsh = tta_cfg.setdefault("fisher", ConfigNode())
        fsh.setdefault("enabled", True)
        if not (bool(get_config(rel, "enabled")) or bool(get_config(fsh, "enabled"))):
            raise ValueError(
                "[eata] both reliability and fisher are disabled — that is "
                "plain Tent; run it as tta.method=tent so results are not "
                "mislabeled"
            )
        super().__init__(tta_cfg, config=config, mesh=mesh, device_transform=device_transform)
