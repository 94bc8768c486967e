"""Streaming continual TTA over ordered domain shifts (BASELINE config #5).

The serving shape this models: an endless test stream whose domain changes
over time — scanner A cases, then scanner B, then C. Plain continual Tent on
such a stream has two measured failure modes (BASELINE.md TTA section):
over-adaptation collapse (entropy driven toward degenerate confidence —
Dice fell to ~0.29 at steps=16 on the scanner-shift fixture) and stale-
domain carry-over (state adapted to scanner A starting scanner B worse than
source). The reference has only the per-domain METRIC machinery this feeds
(reference: src/evaluation/seg_eval.py:362-392); the stream control itself
is a new capability.

``StreamTTAController`` owns the adapted state across the stream:

  Reset policy (``policy``):
    - ``"episodic"``               re-anchor to source before every batch
    - ``"continual"``              never re-anchor (plain online Tent)
    - ``"reset_on_domain_change"`` continual within a domain, re-anchor at
                                   domain boundaries (domain labels come
                                   with the stream; the manifest has them)

  Collapse guard (orthogonal, ``guard=True``): an entropy watchdog. The
  final-step adaptation entropy is compared against a floor derived from
  the stream's FIRST pre-adaptation entropy (``entropy_floor_ratio * e0``).
  Dropping below the floor is the collapse signature — entropy minimization
  has driven predictions degenerate-confident — and triggers a re-anchor
  (source params + fresh optimizer state). ``periodic_reanchor_every``
  additionally bounds drift without any trigger.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from ..conf.node import ConfigNode
from ..utils.config import get_config
from ..utils.logger import get_logger

POLICIES = ("episodic", "continual", "reset_on_domain_change")


class StreamTTAController:
    def __init__(
        self,
        adapter,
        source_state,
        *,
        threshold: float,
        policy: str = "continual",
        guard: bool = False,
        entropy_floor_ratio: float = 0.2,
        periodic_reanchor_every: int = 0,
        predict_mode: str = "inline",
    ):
        if str(policy) not in POLICIES:
            raise ValueError(f"[stream] unknown policy {policy!r}; known: {POLICIES}")
        if adapter.episodic:
            raise ValueError(
                "[stream] the controller owns reset policy — build the "
                "adapter with episodic=false and choose policy='episodic' "
                "here instead"
            )
        if not hasattr(adapter, "make_adapt_predict_fn"):
            raise ValueError(
                f"[stream] adapter {type(adapter).__name__} has no fused "
                f"adapt+predict serving path (make_adapt_predict_fn) — the "
                f"streaming protocol requires it (tta method 'tent')"
            )
        self.adapter = adapter
        self.policy = str(policy)
        self.guard = bool(guard)
        self.floor_ratio = float(entropy_floor_ratio)
        self.period = int(periodic_reanchor_every or 0)
        self.logger = get_logger()

        self._source_state = source_state
        self._ap = adapter.make_adapt_predict_fn(
            source_state, threshold=float(threshold), predict_mode=predict_mode
        )
        self.state = source_state
        self._e0: Optional[float] = None
        self._last_domain: Optional[str] = None
        self._n_batches = 0
        self.n_reanchors = 0
        self.reanchor_log = []  # (batch_idx, reason)

    @classmethod
    def from_config(cls, adapter, source_state, config, *, threshold: float):
        scfg = get_config(config, "tta.stream", ConfigNode())
        return cls(
            adapter,
            source_state,
            threshold=threshold,
            policy=str(get_config(scfg, "policy", "continual")),
            guard=bool(get_config(scfg, "guard", False)),
            entropy_floor_ratio=float(get_config(scfg, "entropy_floor_ratio", 0.2)),
            periodic_reanchor_every=int(get_config(scfg, "periodic_reanchor_every", 0)),
            predict_mode=str(get_config(config, "tta.predict", "inline")),
        )

    # ------------------------------------------------------------------
    def reanchor(self, reason: str = "manual") -> None:
        """Back to the source model: params, batch stats AND optimizer
        momentum (a re-anchor that keeps stale momentum immediately walks
        back toward the state it just abandoned)."""
        self.state = self._source_state
        if hasattr(self.adapter, "reset_optimizer"):
            self.adapter.reset_optimizer()
        self.n_reanchors += 1
        self.reanchor_log.append((self._n_batches, reason))
        self.logger.info(f"[stream] re-anchored to source at batch {self._n_batches} ({reason})")

    def step(
        self, image, n_valid: int, domain: Optional[str] = None
    ) -> Tuple[Any, Dict[str, Any]]:
        """Adapt + predict one stream batch; returns (pred, info)."""
        if self.policy == "episodic":
            self.reanchor("episodic")
            self.reanchor_log.pop()  # per-batch resets aren't events
            self.n_reanchors -= 1
        elif self.policy == "reset_on_domain_change":
            if domain is not None and self._last_domain is not None and domain != self._last_domain:
                self.reanchor(f"domain {self._last_domain} -> {domain}")
        self._last_domain = domain

        image = jnp.asarray(image)
        mesh = getattr(self.adapter, "mesh", None)
        if mesh is not None:
            # mesh-sharded jit needs the batch divisible by the data axis;
            # pad with zero rows — n_valid masks them out of the objective
            from ..parallel.mesh import data_axis_size

            mult = data_axis_size(mesh)
            b = image.shape[0]
            if b % mult:
                pad = ((0, mult - b % mult),) + ((0, 0),) * (image.ndim - 1)
                image = jnp.pad(image, pad)
        # anchor the adapter's in-scan early-stop floor at the STREAM's
        # first pre-adaptation entropy: in continual mode each batch's own
        # first-step entropy is already collapsed, so the adapter's
        # batch-relative fallback anchor never fires on a drifting stream
        # (measured — the absolute anchor is what rescues the collapse)
        floor = None
        if getattr(self.adapter, "early_stop", False) and self._e0 is not None:
            floor = float(self.adapter.early_stop_ratio) * self._e0
        self.state, pred = self._ap(self.state, image, int(n_valid), ent_floor=floor)
        ents = self.adapter._last_ents
        ent_first = float(ents[0])
        ent_final = float(ents[-1])
        if self._e0 is None:
            # the stream's first pre-adaptation entropy anchors the floor
            self._e0 = ent_first
        self._n_batches += 1

        info = {
            "entropy_first": ent_first,
            "entropy_final": ent_final,
            "domain": domain,
            "reanchored": False,
            "reason": None,
        }
        if self.guard and self._e0 > 0 and ent_final < self.floor_ratio * self._e0:
            info["reanchored"] = True
            info["reason"] = (
                f"entropy watchdog: {ent_final:.4g} < "
                f"{self.floor_ratio:.2f} * e0={self._e0:.4g}"
            )
            self.reanchor(info["reason"])
        elif self.period and self._n_batches % self.period == 0:
            info["reanchored"] = True
            info["reason"] = f"periodic every {self.period}"
            self.reanchor(info["reason"])
        return pred, info


def binary_dice_per_case(pred, label, n_valid: int):
    """Per-case binary Dice with empty-GT gating (the seg_eval gating rule:
    cases with empty ground truth don't contribute)."""
    import numpy as np

    out = []
    p = np.asarray(pred)[:n_valid].astype(np.float64)
    y = np.asarray(label)[:n_valid].astype(np.float64)
    for i in range(n_valid):
        if y[i].sum() > 0:
            out.append(2.0 * (p[i] * y[i]).sum() / max(p[i].sum() + y[i].sum(), 1.0))
    return out


def evaluate_stream(controller: StreamTTAController, stream) -> Dict[str, Any]:
    """Run an ordered (domain, batch) stream through the controller and
    report Dice overall, per domain, and per stream position — the
    BASELINE config #5 protocol surface (per-domain schema matching
    seg_eval's ``dom/<domain>/...`` keys)."""
    import numpy as np

    per_domain: Dict[str, list] = {}
    positions = []
    for pos, (domain, batch) in enumerate(stream):
        n = int(batch.get("_n_valid", batch["image"].shape[0]))
        pred, info = controller.step(batch["image"], n, domain=domain)
        ds = binary_dice_per_case(pred, batch["label"], n)
        per_domain.setdefault(str(domain), []).extend(ds)
        positions.append(
            {
                "pos": pos,
                "domain": str(domain),
                "dice": round(float(np.mean(ds)), 4) if ds else None,
                "entropy": round(info["entropy_final"], 5),
                "reanchored": bool(info["reanchored"]),
            }
        )
    alls = [d for v in per_domain.values() for d in v]
    metrics: Dict[str, Any] = {
        "avg_dc": round(float(np.mean(alls)), 4) if alls else 0.0,
        "n_cases": len(alls),
        "reanchors": controller.n_reanchors,
        "policy": controller.policy + ("+guard" if controller.guard else ""),
        "positions": positions,
    }
    for dom, v in per_domain.items():
        metrics[f"dom/{dom}/avg_dc"] = round(float(np.mean(v)), 4) if v else 0.0
    return metrics
