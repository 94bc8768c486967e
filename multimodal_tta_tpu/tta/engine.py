"""TTA evaluation engine.

Uniform runner for the adaptation modes (BASELINE.json configs):
  - "none":     plain inference (source model, no adaptation)
  - "tent":     episodic Tent — adapt from source weights on every batch
  - continual:  tent with episodic=false — the adapted state streams across
                batches/domains (config #5)

The engine wraps an evaluation strategy: adaptation plugs into the
strategy's per-batch hook, so metric schema and per-domain aggregation are
identical with and without TTA.
"""

from __future__ import annotations

from typing import Dict

from ..conf.node import ConfigNode
from ..registry import get_evaluation_strategy, get_tta_method
from ..utils.config import get_config
from ..utils.logger import get_logger


class TTAEngine:
    def __init__(self, config, mesh=None, device_transform=None, strategy=None):
        self.config = config
        self.mesh = mesh
        self.logger = get_logger()

        self.tta_cfg = get_config(config, "tta", ConfigNode())
        self.method = str(get_config(self.tta_cfg, "method", "none")).lower()

        if strategy is None:
            name = get_config(config, "task.eval_strategy", "seg_eval")
            strategy = get_evaluation_strategy(name)(config)
        self.strategy = strategy
        self.device_transform = device_transform

        self.adapter = None
        if self.method not in ("none", ""):
            adapter_cls = get_tta_method(self.method)
            self.adapter = adapter_cls(
                self.tta_cfg,
                config=config,
                mesh=mesh,
                device_transform=device_transform,
            )

    @property
    def episodic(self) -> bool:
        return self.adapter.episodic if self.adapter is not None else True

    def evaluate(self, state, data_loader) -> Dict[str, float]:
        """Run (adapt +) evaluate over the loader; returns the seg_eval
        metric dict."""
        if self.adapter is None:
            return self.strategy.evaluate_epoch(state, data_loader, self.mesh)

        adapt_fn = self.adapter.make_adapt_fn(state)
        return self.strategy.evaluate_epoch(
            state,
            data_loader,
            self.mesh,
            adapt_fn=adapt_fn,
            carry_state=not self.adapter.episodic,
        )
