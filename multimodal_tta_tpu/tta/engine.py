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


def classifier_logits_apply(model):
    """Adapt a classification backbone with the TTA engine.

    The 2D backbone registry (resnet/densenet/vit/efficientnet — the
    reference's torchvision wrappers, e.g. /root/reference/src/models/
    resnet.py:130-161) returns ``(features, logits)``; the adapters expect
    an ``apply_fn`` whose output is the logits tensor (plus the
    ``batch_stats`` update dict when called mutable — the BatchNorm
    statistic-recompute path, which for classifiers under covariate shift
    is most of Tent's value). This wrapper bridges the two contracts so a
    ``TrainState`` built from any registered backbone drops straight into
    ``tta.method=tent/memo/sar/...``:

        state = TrainState.create(apply_fn=classifier_logits_apply(model),
                                  params=v["params"],
                                  batch_stats=v["batch_stats"], ...)

    Classification is the TTA literature's native setting (Tent, MEMO, SAR
    and EATA were all published on corrupted-classification benchmarks);
    the segmentation workloads add the dense-3D machinery on top, but the
    engine itself is model-agnostic — tests/test_tta_classification.py
    holds the proof (BN-stat recompute + affine entropy minimization
    recovers accuracy under covariate shift with zero labels).
    """

    def apply_fn(variables, x, train=False, mutable=None, **kw):
        if mutable:
            (_, logits), updates = model.apply(
                variables, x, train=train, mutable=mutable, **kw
            )
            return logits, updates
        return model.apply(variables, x, train=train, **kw)[1]

    return apply_fn
