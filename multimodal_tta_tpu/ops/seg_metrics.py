"""Batched segmentation metrics as pure jnp reductions.

``binary_dice_iou`` reproduces the reference's per-sample, per-region Dice/IoU
with BraTS-style empty-GT gating (reference: src/evaluation/seg_eval.py:41-68):
regions with an empty ground truth are marked invalid and excluded from the
aggregate means by the caller.

Layout is channels-last ``[B, *spatial, R]``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def binary_dice_iou(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    eps: float = 1e-7,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """pred, gt: [B, *spatial, R] binary ({0,1}, any numeric dtype).

    Returns (dice [B,R], iou [B,R], valid [B,R] bool) where valid means the
    GT region is non-empty.
    """
    b, r = pred.shape[0], pred.shape[-1]
    p = pred.reshape(b, -1, r).astype(jnp.float32)
    g = gt.reshape(b, -1, r).astype(jnp.float32)

    inter = jnp.sum(p * g, axis=1)
    p_sum = jnp.sum(p, axis=1)
    g_sum = jnp.sum(g, axis=1)

    valid = g_sum > 0
    dice = (2.0 * inter + eps) / (p_sum + g_sum + eps)
    union = p_sum + g_sum - inter
    iou = (inter + eps) / (union + eps)
    return dice, iou, valid


@jax.jit
def dice_iou_from_logits(
    logits: jnp.ndarray,
    gt: jnp.ndarray,
    threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sigmoid -> threshold -> dice/iou/valid, plus pred emptiness per region.

    Mirrors the reference eval path (reference: src/evaluation/seg_eval.py:304-308).
    Returns (dice, iou, valid, pred_empty), all [B, R].
    """
    prob = jax.nn.sigmoid(logits)
    pred = (prob >= threshold).astype(jnp.float32)
    gt_bin = (gt > 0.5).astype(jnp.float32)
    dice, iou, valid = binary_dice_iou(pred, gt_bin)
    b, r = pred.shape[0], pred.shape[-1]
    pred_empty = jnp.sum(pred.reshape(b, -1, r), axis=1) == 0
    return dice, iou, valid, pred_empty
