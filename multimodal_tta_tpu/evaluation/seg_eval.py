"""Segmentation evaluation strategy ("seg_eval").

Reproduces the reference's BraTS-style region evaluation (reference:
src/evaluation/seg_eval.py:151-478) with the identical flat metric-dict key
schema — ``{region}_dc``, ``avg_dc``, ``miou``, ``jc``, ``loss``, optional
``{region}_hd95``/``{region}_asd`` (+averages), and per-domain variants under
``dom/<domain>/...`` — so downstream log parsing is unchanged.

TPU-native evaluation path: one jitted step runs forward (eval mode), sigmoid
-> threshold -> per-sample/per-region dice/iou with empty-GT gating, the
optional DiceCE loss per sample, and (when enabled) HD95/ASD surface
distances via the on-device euclidean distance transform. Only [B,R] metric
tensors leave the device — no volume-sized D2H transfers (the reference
pulls per-voxel tensors to host each batch, seg_eval.py:363-392).

Batches whose size doesn't divide the mesh are zero-padded; padded samples
have empty GT so the validity gate masks them out of every accumulator.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..conf.node import ConfigNode
from ..ops.losses import make_criterion
from ..ops.seg_metrics import binary_dice_iou
from ..parallel.mesh import batch_sharding, replicated
from ..registry import register_evaluation_strategy
from ..utils.config import get_config
from ..utils.logger import get_logger


def as_list_str(x: Any, batch_size: int) -> List[str]:
    """Normalize a batch 'domain' field to List[str] of length B
    (reference: seg_eval.py:20-38)."""
    if x is None:
        return [""] * batch_size
    if isinstance(x, (list, tuple)):
        return [str(v) for v in x]
    if isinstance(x, str):
        return [x] * batch_size
    if isinstance(x, np.ndarray):
        if x.ndim == 0:
            return [str(x.item())] * batch_size
        if x.size == batch_size:
            return [str(int(v)) for v in x.reshape(-1)]
    return [str(x)] * batch_size


def diag_mm_from_shape(d: int, h: int, w: int, spacing: Tuple[float, float, float]) -> float:
    """Volume-diagonal upper bound in mm (reference: seg_eval.py:89-103)."""
    sd, sh, sw = spacing
    dd = max(d - 1, 0) * sd
    hh = max(h - 1, 0) * sh
    ww = max(w - 1, 0) * sw
    return float(math.sqrt(dd * dd + hh * hh + ww * ww))


class _Accum:
    """Per-region sum/count accumulator (overall + per-domain)."""

    def __init__(self, n_regions: int):
        self.r = n_regions
        self.sum = np.zeros(n_regions, np.float64)
        self.cnt = np.zeros(n_regions, np.float64)

    def add(self, values: np.ndarray, valid: np.ndarray) -> None:
        """values/valid: [B, R]."""
        v = np.where(valid, values, 0.0)
        self.sum += v.sum(axis=0)
        self.cnt += valid.astype(np.float64).sum(axis=0)

    def means(self) -> List[float]:
        return [float(self.sum[c] / self.cnt[c]) if self.cnt[c] > 0 else 0.0 for c in range(self.r)]

    def valid_mean(self) -> float:
        means = self.means()
        valid_idx = [i for i in range(self.r) if self.cnt[i] > 0]
        return float(sum(means[i] for i in valid_idx) / max(1, len(valid_idx)))


@register_evaluation_strategy("seg_eval")
class SegmentationEvaluationStrategy:
    def __init__(self, config: Optional[ConfigNode] = None):
        self.config = config or ConfigNode()
        self.logger = get_logger()

        seg_cfg = get_config(self.config, "evaluation.seg", ConfigNode())
        self.threshold = float(get_config(seg_cfg, "threshold", 0.5))
        self.region_order = [str(r) for r in get_config(seg_cfg, "region_order", ["ET", "TC", "WT"])]

        spacing = list(get_config(seg_cfg, "spacing", [1.0, 1.0, 1.0]))
        if len(spacing) != 3:
            raise ValueError(f"[SegEval] evaluation.seg.spacing must have length 3, got {spacing}")
        self.spacing = (float(spacing[0]), float(spacing[1]), float(spacing[2]))

        self.report_loss = bool(get_config(self.config, "evaluation.loss.report_loss", False))

        surf_cfg = get_config(self.config, "evaluation.surface", ConfigNode())
        self.enable_surface = bool(get_config(surf_cfg, "enable", False))
        self.asd_symmetric = bool(get_config(surf_cfg, "asd_symmetric", False))
        # Normalized Surface Dice at tolerance (mm): scalar, or per-region
        # list matching region_order. None disables the metric (default —
        # the reference's MONAI path reports HD95/ASD only; NSD is the
        # boundary metric the nnU-Net era standardized on).
        nsd_tol = get_config(surf_cfg, "nsd_tol", None)
        if nsd_tol is None:
            self.nsd_tol = None
        elif isinstance(nsd_tol, (list, tuple)):
            if len(nsd_tol) != len(self.region_order):
                raise ValueError(
                    f"[SegEval] evaluation.surface.nsd_tol list must match "
                    f"region_order length {len(self.region_order)}, got {list(nsd_tol)}"
                )
            self.nsd_tol = [float(t) for t in nsd_tol]
        else:
            self.nsd_tol = float(nsd_tol)

        # When transforms defer normalization to the device
        # (training.data.transforms.on_device), the eval forward must apply it
        # too — the datasets then emit RAW intensities.
        tcfg = get_config(self.config, "training.data.transforms", ConfigNode())
        self._norm_fn = None
        if bool(get_config(tcfg, "on_device", False)) and bool(get_config(tcfg, "normalize", False)):
            from ..ops.intensity import make_intensity_normalizer

            channel_names = get_config(self.config, "dataset.modality_order", None)
            self._norm_fn = make_intensity_normalizer(
                normalize=True,
                intensity_policy=get_config(tcfg, "intensity_policy", None),
                channel_names=[str(c) for c in channel_names] if channel_names else None,
                mean=get_config(tcfg, "mean", None),
                std=get_config(tcfg, "std", None),
            )

        # Optional sliding-window inference (for volumes larger than HBM
        # allows whole; BASELINE.json north star). Whole-volume forward when
        # disabled — the reference's only mode (seg_eval.py:300).
        sw_cfg = get_config(self.config, "evaluation.sliding_window", ConfigNode())
        self.sw_enable = bool(get_config(sw_cfg, "enable", False))
        self.sw_roi = tuple(int(x) for x in get_config(sw_cfg, "roi_size", [64, 64, 64]))
        self.sw_overlap = float(get_config(sw_cfg, "overlap", 0.25))
        self.sw_mode = str(get_config(sw_cfg, "mode", "gaussian"))

        # Flip-averaged test-time augmentation (ops/flip_tta.py): average
        # probabilities over every spatial mirror combination — 2^k forwards
        # per batch for a small free robustness gain. NDHWC spatial axes are
        # 1 (D), 2 (H), 3 (W). The reference has no TTA-augmentation path
        # (one plain forward, reference seg_eval.py:300).
        ft_cfg = get_config(self.config, "evaluation.flip_tta", ConfigNode())
        self.flip_enable = bool(get_config(ft_cfg, "enable", False))
        self.flip_axes = tuple(int(a) for a in get_config(ft_cfg, "axes", [1, 2, 3]))
        if self.flip_enable and not all(1 <= a <= 3 for a in self.flip_axes):
            raise ValueError(
                f"[SegEval] evaluation.flip_tta.axes must be spatial (1..3 "
                f"in NDHWC), got {list(self.flip_axes)}"
            )

        crit_cfg = get_config(self.config, "training.criterion", ConfigNode())
        # Eval loss mirrors training config but always sigmoid (reference:
        # seg_eval.py:209-220 builds DiceCELoss with sigmoid=True).
        eval_crit = ConfigNode(
            {
                "sigmoid": True,
                "softmax": False,
                "include_background": bool(get_config(crit_cfg, "include_background", True)),
                "squared_pred": bool(get_config(crit_cfg, "squared_pred", False)),
                "jaccard": bool(get_config(crit_cfg, "jaccard", False)),
                "lambda_dice": float(get_config(crit_cfg, "lambda_dice", 1.0)),
                "lambda_ce": float(get_config(crit_cfg, "lambda_ce", 1.0)),
            }
        )
        w = get_config(crit_cfg, "weight", None)
        if w is not None and len(list(w)) > 0:
            eval_crit["ce_weight"] = [float(x) for x in list(w)]
        self.loss_fn = make_criterion(eval_crit)

        td = str(get_config(self.config, "training.transfer_dtype", "float32")).lower()
        self._transfer_dtype = {"float32": None, "float16": np.float16, "bfloat16": jnp.bfloat16}[td]

        # Optional best-model criterion (the trainer delegates to the
        # strategy's is_best_model when defined — reference:
        # seg_trainer.py:85-88). Unset -> trainer falls back to min val loss.
        self.best_metric = get_config(self.config, "evaluation.best_metric", None)
        self.best_mode = str(get_config(self.config, "evaluation.best_mode", "max")).lower()

        self._eval_step = None
        self._mesh_sig = None

    def is_best_model(self, eval_stats: Dict[str, float], best_metrics: Dict[str, float]) -> bool:
        if self.best_metric is None:
            # preserve the reference default: min validation loss
            current = eval_stats.get("loss", 0.0)
            return current < best_metrics.get("loss", float("inf"))
        name = str(self.best_metric)
        current = eval_stats.get(name)
        if current is None:
            return False
        if self.best_mode == "min":
            return current < best_metrics.get(name, float("inf"))
        return current > best_metrics.get(name, float("-inf"))

    # ------------------------------------------------------------------
    def _probs_fn(self, state, with_variance: bool = False):
        """Trace-time closure: raw device image -> (logits, prob).

        Single source of truth for the inference forward — upcast from the
        compact transfer dtype, on-device normalization, sliding-window and
        flip-TTA options — shared by the eval step and the prediction
        exporter so exported masks are exactly the masks the evaluator
        scores.

        ``with_variance=True`` (requires flip-TTA enabled) returns
        ``(logits, prob, var)`` with the mirror-ensemble disagreement map
        (ops/flip_tta.py) — the exporter's uncertainty volume.
        """
        if with_variance and not self.flip_enable:
            raise ValueError(
                "[SegEval] uncertainty maps need an ensemble: enable "
                "evaluation.flip_tta (the variance is computed over the "
                "mirror views)"
            )
        sw_enable = self.sw_enable
        sw_roi, sw_overlap, sw_mode = self.sw_roi, self.sw_overlap, self.sw_mode
        flip_enable, flip_axes = self.flip_enable, self.flip_axes
        n_regions = len(self.region_order)
        norm_fn = self._norm_fn

        def probs(image):
            image = image.astype(jnp.float32)  # upcast compact transfer dtypes
            if norm_fn is not None:
                image = jax.vmap(norm_fn)(image)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats

            if sw_enable:
                from ..ops.sliding_window import sliding_window_inference

                def forward(x):
                    return sliding_window_inference(
                        lambda w: state.apply_fn(variables, w, train=False),
                        x,
                        sw_roi,
                        num_classes=n_regions,
                        overlap=sw_overlap,
                        mode=sw_mode,
                    )

            else:

                def forward(x):
                    return state.apply_fn(variables, x, train=False)

            if flip_enable:
                from ..ops.flip_tta import flip_averaged_probs

                return flip_averaged_probs(
                    forward, image, flip_axes, jax.nn.sigmoid,
                    with_variance=with_variance,
                )
            logits = forward(image)
            prob = jax.nn.sigmoid(logits)
            return logits, prob

        return probs

    def _build_eval_step(self, mesh):
        threshold = self.threshold
        loss_fn = self.loss_fn
        report_loss = self.report_loss
        enable_surface = self.enable_surface
        spacing = self.spacing
        asd_symmetric = self.asd_symmetric
        nsd_tol = self.nsd_tol

        def step(state, image, label):
            label = label.astype(jnp.float32)
            logits, prob = self._probs_fn(state)(image)
            pred = (prob >= threshold).astype(jnp.float32)
            gt = (label.astype(jnp.float32) > 0.5).astype(jnp.float32)

            dice, iou, valid = binary_dice_iou(pred, gt)
            b, r = pred.shape[0], pred.shape[-1]
            pred_empty = jnp.sum(pred.reshape(b, -1, r), axis=1) == 0

            out = {"dice": dice, "iou": iou, "valid": valid, "pred_empty": pred_empty}

            if report_loss:
                per_sample = jax.vmap(lambda lg, lb: loss_fn(lg[None], lb[None]))(
                    logits, label.astype(jnp.float32)
                )
                out["loss"] = per_sample  # [B]

            if enable_surface:
                from ..ops.surface import batched_surface_metrics

                res = batched_surface_metrics(
                    pred,
                    gt,
                    spacing=spacing,
                    symmetric_asd=asd_symmetric,
                    nsd_tol=nsd_tol,
                )
                out["hd95"], out["asd"] = res[0], res[1]
                if nsd_tol is not None:
                    out["nsd"] = res[2]

            return out

        if mesh is not None:
            bsh = batch_sharding(mesh)
            rep = replicated(mesh)
            return jax.jit(step, in_shardings=(rep, bsh, bsh), out_shardings=rep)
        return jax.jit(step)

    # ------------------------------------------------------------------
    def evaluate_epoch(
        self,
        state,
        data_loader,
        mesh=None,
        adapt_fn=None,
        carry_state: bool = False,
    ) -> Dict[str, float]:
        """Evaluate (optionally with per-batch test-time adaptation).

        adapt_fn(state, image, label_shape_batch) -> adapted state is invoked
        per batch BEFORE the eval step (the TTA hook point). With
        ``carry_state`` the adapted state flows into the next batch
        (continual TTA); otherwise each batch adapts from the source state
        (episodic).
        """
        R = len(self.region_order)

        acc_dice, acc_iou = _Accum(R), _Accum(R)
        acc_hd95, acc_asd, acc_nsd = _Accum(R), _Accum(R), _Accum(R)
        dom_dice: Dict[str, _Accum] = defaultdict(lambda: _Accum(R))
        dom_iou: Dict[str, _Accum] = defaultdict(lambda: _Accum(R))
        dom_hd95: Dict[str, _Accum] = defaultdict(lambda: _Accum(R))
        dom_asd: Dict[str, _Accum] = defaultdict(lambda: _Accum(R))
        dom_nsd: Dict[str, _Accum] = defaultdict(lambda: _Accum(R))
        report_nsd = self.enable_surface and self.nsd_tol is not None

        total_loss = 0.0
        n_samples = 0

        if self._eval_step is None or self._mesh_sig != id(mesh):
            self._eval_step = self._build_eval_step(mesh)
            self._mesh_sig = id(mesh)

        from ..data.prefetch import prefetch_to_device

        # pad + shard + H2D one batch ahead of the eval step
        stream = prefetch_to_device(
            data_loader,
            mesh,
            image_transfer_dtype=self._transfer_dtype,
            label_transfer_dtype=np.uint8,
        )

        for batch in tqdm(stream, desc="Evaluate SEG (regions)", leave=False):
            image = batch["image"]
            label = batch["label"]
            if label.ndim != image.ndim:
                raise ValueError(f"[SegEval] label must be [B,...,R], got {label.shape}")
            if int(label.shape[-1]) != R:
                raise ValueError(
                    f"[SegEval] label channels={label.shape[-1]} but region_order={R}"
                )
            B = int(batch["_n_valid"])
            domains = as_list_str(batch.get("domain"), B)

            eval_state = state
            if adapt_fn is not None:
                eval_state = adapt_fn(state, image, B)
                if carry_state:
                    state = eval_state

            out = self._eval_step(eval_state, image, label)
            dice = np.asarray(out["dice"])[:B]
            iou = np.asarray(out["iou"])[:B]
            valid = np.asarray(out["valid"])[:B]
            pred_empty = np.asarray(out["pred_empty"])[:B]

            if self.enable_surface:
                D, H, W = image.shape[1:4]
                diag = diag_mm_from_shape(D, H, W, self.spacing)
                hd95 = np.asarray(out["hd95"])[:B]
                asd = np.asarray(out["asd"])[:B]
                # penalty: GT non-empty & pred empty -> volume diagonal; and
                # sanitize nan/inf among valid entries (reference: 347-360)
                penalty = valid & pred_empty
                hd95 = np.where(penalty, diag, hd95)
                asd = np.where(penalty, diag, asd)
                hd95 = np.where(valid & ~np.isfinite(hd95), diag, hd95)
                asd = np.where(valid & ~np.isfinite(asd), diag, asd)
                if report_nsd:
                    # NSD is a similarity in [0,1]: the worst-case penalty
                    # (empty/degenerate prediction against non-empty GT) is 0.
                    nsd = np.asarray(out["nsd"])[:B]
                    nsd = np.where(penalty, 0.0, nsd)
                    nsd = np.where(valid & ~np.isfinite(nsd), 0.0, nsd)

            acc_dice.add(dice, valid)
            acc_iou.add(iou, valid)
            if self.enable_surface:
                acc_hd95.add(hd95, valid)
                acc_asd.add(asd, valid)
                if report_nsd:
                    acc_nsd.add(nsd, valid)

            for i in range(B):
                dom = domains[i]
                v = valid[i : i + 1]
                dom_dice[dom].add(dice[i : i + 1], v)
                dom_iou[dom].add(iou[i : i + 1], v)
                if self.enable_surface:
                    dom_hd95[dom].add(hd95[i : i + 1], v)
                    dom_asd[dom].add(asd[i : i + 1], v)
                    if report_nsd:
                        dom_nsd[dom].add(nsd[i : i + 1], v)

            if self.report_loss:
                loss = np.asarray(out["loss"])[:B]
                total_loss += float(loss.sum())
                n_samples += B

        # ---- finalize (exact key schema of reference seg_eval.py:402-477) ----
        metrics: Dict[str, float] = {}
        mean_dice = acc_dice.means()
        for name, v in zip(self.region_order, mean_dice):
            metrics[f"{name.lower()}_dc"] = v
        metrics["avg_dc"] = acc_dice.valid_mean()
        miou = acc_iou.valid_mean()
        metrics["miou"] = miou
        metrics["jc"] = miou
        metrics["loss"] = float(total_loss / max(1, n_samples)) if self.report_loss else 0.0

        if self.enable_surface:
            for name, v in zip(self.region_order, acc_hd95.means()):
                metrics[f"{name.lower()}_hd95"] = v
            metrics["avg_hd95"] = acc_hd95.valid_mean()
            for name, v in zip(self.region_order, acc_asd.means()):
                metrics[f"{name.lower()}_asd"] = v
            metrics["avg_asd"] = acc_asd.valid_mean()
            if report_nsd:
                for name, v in zip(self.region_order, acc_nsd.means()):
                    metrics[f"{name.lower()}_nsd"] = v
                metrics["avg_nsd"] = acc_nsd.valid_mean()

        for dom in sorted(dom_dice.keys()):
            safe = dom if dom != "" else "unknown"
            for name, v in zip(self.region_order, dom_dice[dom].means()):
                metrics[f"dom/{safe}/{name.lower()}_dc"] = v
            metrics[f"dom/{safe}/avg_dc"] = dom_dice[dom].valid_mean()
            metrics[f"dom/{safe}/miou"] = dom_iou[dom].valid_mean()
            if self.enable_surface:
                for name, v in zip(self.region_order, dom_hd95[dom].means()):
                    metrics[f"dom/{safe}/{name.lower()}_hd95"] = v
                metrics[f"dom/{safe}/avg_hd95"] = dom_hd95[dom].valid_mean()
                for name, v in zip(self.region_order, dom_asd[dom].means()):
                    metrics[f"dom/{safe}/{name.lower()}_asd"] = v
                metrics[f"dom/{safe}/avg_asd"] = dom_asd[dom].valid_mean()
                if report_nsd:
                    for name, v in zip(self.region_order, dom_nsd[dom].means()):
                        metrics[f"dom/{safe}/{name.lower()}_nsd"] = v
                    metrics[f"dom/{safe}/avg_nsd"] = dom_nsd[dom].valid_mean()

        return metrics
