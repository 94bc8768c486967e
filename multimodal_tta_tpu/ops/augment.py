"""On-device data augmentation, keyed by JAX PRNG.

The reference augments on CPU in DataLoader workers (reference:
src/datasets/transforms.py:96-116); here the same augmentations are pure jnp
ops applied inside the jitted train step so they fuse with normalization and
the first conv. All randomness is explicit PRNG keys — deterministic replay
for free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rand_intensity_scale_shift(
    key: jax.Array,
    x: jnp.ndarray,
    *,
    scale: float = 0.1,
    shift: float = 0.1,
    prob: float = 0.5,
) -> jnp.ndarray:
    """Per-sample random multiplicative scale and additive shift, each applied
    with probability ``prob`` (reference: RandScaleIntensity/RandShiftIntensity
    with factors/offsets 0.1, prob 0.5 — transforms.py:109-116).

    x: [B, ...]; randomness is per-sample.
    """
    b = x.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    apply_scale = jax.random.uniform(k1, (b,)) < prob
    factor = 1.0 + jax.random.uniform(k2, (b,), minval=-scale, maxval=scale)
    apply_shift = jax.random.uniform(k3, (b,)) < prob
    offset = jax.random.uniform(k4, (b,), minval=-shift, maxval=shift)

    bshape = (b,) + (1,) * (x.ndim - 1)
    factor = jnp.where(apply_scale, factor, 1.0).reshape(bshape).astype(x.dtype)
    offset = jnp.where(apply_shift, offset, 0.0).reshape(bshape).astype(x.dtype)
    return x * factor + offset


def rand_rot90(
    key: jax.Array,
    image: jnp.ndarray,
    label: jnp.ndarray,
    *,
    prob: float = 0.3,
    max_k: int = 3,
    axes: Tuple[int, int] = (2, 3),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample random 90-degree rotations of image+label on the (H, W)
    plane (batch layout [B,D,H,W,C]; axes=(2,3)). Requires H == W inside jit
    (static shapes); MONAI's RandRotate90d has the same constraint in effect
    for non-square planes.
    """
    if image.shape[axes[0]] != image.shape[axes[1]]:
        raise ValueError(
            f"rand_rot90 needs square plane on axes {axes}: got {image.shape}"
        )
    b = image.shape[0]
    k1, k2 = jax.random.split(key)
    do = jax.random.uniform(k1, (b,)) < prob
    ks = jax.random.randint(k2, (b,), 1, max_k + 1)
    k_eff = jnp.where(do, ks, 0)

    def rot_one(img, lbl, k):
        branches = [
            lambda a: a,
            lambda a: jnp.rot90(a, k=1, axes=(axes[0] - 1, axes[1] - 1)),
            lambda a: jnp.rot90(a, k=2, axes=(axes[0] - 1, axes[1] - 1)),
            lambda a: jnp.rot90(a, k=3, axes=(axes[0] - 1, axes[1] - 1)),
        ]
        # per-sample arrays have one fewer leading dim
        img_out = jax.lax.switch(k, branches, img)
        lbl_out = jax.lax.switch(k, branches, lbl)
        return img_out, lbl_out

    return jax.vmap(rot_one)(image, label, k_eff)


def modality_dropout(
    key: jax.Array,
    x: jnp.ndarray,
    *,
    prob: float = 0.25,
) -> jnp.ndarray:
    """Randomly zero whole modalities (channels) per sample, guaranteeing at
    least one modality survives. Used for missing-modality-robust TTA
    (BASELINE.json config #3 — a capability the reference scaffold reserves
    but does not implement).

    x: [B, ..., M].
    """
    b, m = x.shape[0], x.shape[-1]
    k1, k2 = jax.random.split(key)
    drop = jax.random.uniform(k1, (b, m)) < prob
    # force-keep one random modality per sample
    keep_idx = jax.random.randint(k2, (b,), 0, m)
    keep_mask = jax.nn.one_hot(keep_idx, m, dtype=bool)
    drop = jnp.where(keep_mask, False, drop)
    shape = (b,) + (1,) * (x.ndim - 2) + (m,)
    return jnp.where(drop.reshape(shape), jnp.zeros((), x.dtype), x)
