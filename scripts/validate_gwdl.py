"""GWDL value measurement (training.criterion.name=gwdl).

The Generalized Wasserstein Dice Loss (Fidon et al., BrainLes 2017; the
BraTS-2021 entry in PAPERS.md) claims that a class-distance matrix grading
errors by semantic severity steers a trained model's residual mistakes onto
semantically close classes — a rare "core" voxel misread as its surrounding
"edema" (distance 0.5) instead of background (distance 1.0). This script
measures that claim on this framework rather than assuming it.

Task: synthetic 3-class hierarchical label maps (0=background, 1=edema,
2=core nested inside the edema) at HECKTOR-like shape, with the core's
image contrast deliberately weak so core<->edema confusions are the
dominant residual error mode. Two arms train from the same seed through
the real SegTrainer jitted step (softmax label maps):

  - dice_ce  : softmax DiceCE (the reference criterion family,
               reference src/core/trainers/seg_trainer.py:30-57)
  - gwdl     : tree metric M with d(edema,core)=0.5, d(*,background)=1
  - gwdl_ce  : same M + lambda_ce=1 voxel CE (the hybrid; pure GWDL can
               rationally abandon a rare class — see gwdl_ce_loss docstring)

Reported per arm on held-out cases:
  - per-class argmax Dice,
  - severity-weighted error  E = mean_i M[y_i, yhat_i]  (the quantity GWDL
    optimizes; computed with the SAME tree matrix for both arms),
  - the confusion split of mispredicted core voxels (-> edema vs -> bg).

    python scripts/validate_gwdl.py [--epochs 16] [--out r.json]

Results in BASELINE.md (GWDL section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.utils.jax_setup import (  # noqa: E402
    apply_platform_env,
    enable_compilation_cache,
)

apply_platform_env()
enable_compilation_cache()

import numpy as np  # noqa: E402

TREE_M = [[0.0, 1.0, 1.0], [1.0, 0.0, 0.5], [1.0, 0.5, 0.0]]


def make_cases(n: int, shape, seed: int):
    """Generate n cases of [D,H,W,2] images + [D,H,W] int label maps.

    Edema: bright ellipsoid on channel 0 (easy). Core: small sphere inside
    the edema whose only evidence is a WEAK bump on channel 1 (hard) — the
    regime where the model must trade core-vs-edema errors, which is the
    decision GWDL's metric reweights.
    """
    d, h, w = shape
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.meshgrid(
        np.arange(d), np.arange(h), np.arange(w), indexing="ij"
    )
    imgs = np.empty((n, d, h, w, 2), np.float32)
    lbls = np.empty((n, d, h, w), np.int32)
    for i in range(n):
        cz = rng.uniform(0.3, 0.7) * d
        cy = rng.uniform(0.3, 0.7) * h
        cx = rng.uniform(0.3, 0.7) * w
        rz = rng.uniform(6, 10)
        ry = rng.uniform(10, 18)
        rx = rng.uniform(10, 18)
        edema = (
            ((zz - cz) / rz) ** 2 + ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        ) <= 1.0
        # core: small sphere at an offset inside the edema
        oz = cz + rng.uniform(-0.3, 0.3) * rz
        oy = cy + rng.uniform(-0.3, 0.3) * ry
        ox = cx + rng.uniform(-0.3, 0.3) * rx
        rc = rng.uniform(2.5, 4.5)
        core = (
            ((zz - oz) ** 2 + (yy - oy) ** 2 + (xx - ox) ** 2) <= rc**2
        ) & edema
        lbl = np.zeros((d, h, w), np.int32)
        lbl[edema] = 1
        lbl[core] = 2
        ch0 = 1.2 * edema.astype(np.float32)
        ch1 = 0.35 * core.astype(np.float32)  # weak evidence, drowned by noise
        img = np.stack([ch0, ch1], axis=-1)
        img += rng.randn(d, h, w, 2).astype(np.float32) * 0.45
        imgs[i] = img
        lbls[i] = lbl
    return imgs, lbls


def build_trainer(crit_name: str, seed: int):
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.core.train_state import TrainState
    from multimodal_tta_tpu.core.trainers.seg_trainer import SegTrainer
    from multimodal_tta_tpu.models import UNet3D

    crit = {"name": crit_name, "softmax": True, "sigmoid": False}
    if crit_name.startswith("gwdl"):
        crit["name"] = "gwdl"
        crit["distance_matrix"] = TREE_M
        if crit_name == "gwdl_ce":
            crit["lambda_ce"] = 1.0
        elif crit_name == "gwdl_wce":
            # class-weighted CE: unweighted CE is voxel-mass-weighted (like
            # GWDL's transport sum) and cannot resurrect a 0.04%-prevalence
            # class — only a per-class-normalized term can (measured; the
            # dice_ce arm keeps the core BECAUSE soft dice means over classes)
            crit["lambda_ce"] = 1.0
            crit["ce_weight"] = [1.0, 1.0, 50.0]
    cfg = ConfigNode({"task": {"seed": seed}, "training": {"criterion": crit}})
    trainer = SegTrainer(cfg, mesh=None)
    model = UNet3D(
        in_channels=2,
        num_classes=3,
        channels=(16, 32, 64, 128, 256),
        strides=(2, 2, 2, 2),
        num_res_units=2,
        norm="INSTANCE",
    )
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 16, 2)), train=True
    )
    trainer.state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=optax.adam(1e-3),
    )
    return trainer, model


def evaluate(model, params, imgs, lbls, batch: int):
    """Argmax metrics on held-out cases: per-class Dice, severity-weighted
    error under the tree metric, and the core-confusion split."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def predict(params, x):
        logits = model.apply({"params": params}, x, train=False)
        return jnp.argmax(logits, axis=-1)

    preds = []
    for s in range(0, imgs.shape[0], batch):
        preds.append(np.asarray(predict(params, jnp.asarray(imgs[s : s + batch]))))
    pred = np.concatenate(preds, 0)
    y = lbls
    out = {}
    for c, nm in ((1, "edema"), (2, "core")):
        p = pred == c
        g = y == c
        inter = float((p & g).sum())
        out[f"dice_{nm}"] = round(2 * inter / max(float(p.sum() + g.sum()), 1.0), 4)
    M = np.asarray(TREE_M, np.float64)
    out["severity_weighted_err"] = round(float(M[y, pred].mean()), 6)
    core_wrong = (y == 2) & (pred != 2)
    n_cw = max(int(core_wrong.sum()), 1)
    out["core_err_to_edema"] = round(float((pred[core_wrong] == 1).sum()) / n_cw, 4)
    out["core_err_to_bg"] = round(float((pred[core_wrong] == 0).sum()) / n_cw, 4)
    out["core_err_voxels"] = int(core_wrong.sum())
    return out


def train_arm(crit_name: str, data, epochs: int, batch: int, seed: int):
    tr_x, tr_y, va_x, va_y = data
    trainer, model = build_trainer(crit_name, seed)
    rng = np.random.RandomState(seed + 1)
    n = tr_x.shape[0]
    t0 = time.time()
    losses = []
    for _ep in range(epochs):
        order = rng.permutation(n)
        ep_losses = []
        for s in range(0, n, batch):
            idx = order[s : s + batch]
            m = trainer.run_step({"image": tr_x[idx], "label": tr_y[idx]})
            if m:
                ep_losses.append(m["loss"])
        tail = trainer.flush_step_metrics()
        if tail:
            ep_losses.append(tail["loss"])
        losses.append(round(float(np.mean(ep_losses)), 4))
    wall = time.time() - t0
    row = {"criterion": crit_name, "wall_s": round(wall, 1), "loss_curve": losses}
    row.update(evaluate(model, trainer.state.params, va_x, va_y, batch))
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=24)
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--shape", type=int, nargs=3, default=[48, 96, 96])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    shape = tuple(args.shape)
    tr_x, tr_y = make_cases(args.n_train, shape, seed=args.seed + 100)
    va_x, va_y = make_cases(args.n_val, shape, seed=args.seed + 200)
    frac = {c: round(float((tr_y == c).mean()), 5) for c in (0, 1, 2)}
    print(f"[gwdl] class voxel fractions (train): {frac}", flush=True)
    data = (tr_x, tr_y, va_x, va_y)

    out = {"class_fractions": frac}
    for crit in ("dice_ce", "gwdl", "gwdl_ce", "gwdl_wce"):
        row = train_arm(crit, data, args.epochs, args.batch, args.seed)
        out[crit] = row
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
