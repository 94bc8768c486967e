"""Adaptation-quality validation: does Tent recover Dice under domain shift?

The reference repo is a TTA *scaffold* with no TTA algorithm (SURVEY.md §0),
so there is no reference number to match — this script creates the evidence
that the framework's TTA engine does what TTA is for. Protocol:

  1. Generate a synthetic HECKTOR fixture where the held-out target center
     (CHUP) has a simulated scanner shift (multiplicative bias field + PET
     gamma + CT gain/noise — the bias field survives the masked-z-score
     normalization, so the shift reaches the model).
  2. Train the flagship UNet on the source centers only.
  3. Evaluate the target center: no-adapt vs Tent episodic (strict
     adapt-then-predict) vs Tent continual vs the online inline protocol.

    python scripts/validate_tta.py [--epochs 24] [--steps-list 1 4] \
        [--lrs 1e-3 1e-2] [--out r.json]

Prints one JSON line per mode and a verdict line with the Dice deltas.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache  # noqa: E402

apply_platform_env()  # honor JAX_PLATFORMS under sitecustomize pins
enable_compilation_cache()

SHIFT = {
    "CHUP": {
        "bias_field": 0.6,
        "ct_gain": 1.3,
        "ct_bias": 80.0,
        "pt_gamma": 2.0,
        "pt_gain": 0.6,
        "noise": 150.0,
    }
}


def ensure_fixture(root: str) -> str:
    manifest = os.path.join(root, "manifest.csv")
    if os.path.exists(manifest):
        return manifest
    from multimodal_tta_tpu.data.synthetic import make_hecktor_fixture

    print("[validate_tta] generating shifted fixture ...", file=sys.stderr)
    return make_hecktor_fixture(
        root,
        centers={"CHGJ": 16, "CHUS": 16, "CHUM": 16, "CHUP": 16},
        shape=(144, 144, 48),
        seed=11,
        n_lesions=(1, 3),
        radius_range=(4.0, 9.0),
        # LOW lesion contrast (vs the 200/4-sigma background): the trained
        # model keeps boundary uncertainty, so its entropy is non-degenerate
        # and entropy minimization has a gradient to follow — with the
        # default crisp +300HU lesions the source model saturates and Tent
        # deltas collapse to +-1e-4 (measured; see BASELINE.md)
        lesion_contrast=(150.0, 4.0),
        domain_shift=SHIFT,
    )


def train_source(manifest: str, epochs: int, out_root: str, resume: str = None,
                 model: str = "unet", eval_batch: int = 8, seed: int = None,
                 extra=()):
    """Train the source model (default: the flagship UNet) on the source
    centers; returns (manager, cfg). With ``resume`` (a checkpoint path sans
    extension), training is skipped and the checkpoint is loaded instead —
    re-evaluating new TTA configs against an already-trained source model
    costs no retraining. ``--model unet_ws`` measures the compound
    throughput-max config's quality (unet_ws + tail scope, BASELINE.md)."""
    from _validate_common import bring_up

    # registry names without their own config group (unet_ws, unet variants)
    # ride the unet group file with the name overridden, as validate_unet_ws
    # does
    group = model if os.path.exists(
        os.path.join(REPO_ROOT, "configs", "model", f"{model}.yaml")) else "unet"
    overrides = [
        "task=hecktor21",
        "dataset=hecktor21",
        f"model={group}",
        *([] if group == model else [f"model.name={model}"]),
        f"dataset.manifest_csv={manifest}",
        "dataset.expected_shape=[144,144,48]",
        "dataset.target_center=CHUP",
        "dataset.val_per_center=2",
        "dataset.cache_in_memory=true",
        f"training.epochs={epochs}",
        "training.batch_size=8",
        f"training.eval_batch_size={eval_batch}",
        "training.num_workers=8",
        "training.device_cache=true",
        "training.optimizer=adam",
        "training.optimizers.adam.lr=1e-3",
        "training.eval_test.start_epoch=0",
        f"training.eval_test.every_n_epochs={max(epochs // 3, 1)}",
        "training.eval_test.run_last=true",
        "training.eval_test.do_test=false",
        "training.model_save_start=9999",
        f"task.save_dir={out_root}",
        f"task.run_name=tta_validate_{model}",
    ]
    if seed is not None:
        # seed-variance protocol (BASELINE.md N=3 tables): the seed drives
        # model init AND the training batch schedule; the split stays pinned
        # (dataset.split_seed is separate) so every seed sees the same data
        overrides.append(f"task.seed={int(seed)}")
    overrides.extend(extra)
    return bring_up(overrides, resume=resume, tag=f"validate_tta_{model}")


def eval_mode(manager, cfg, test_loader, device_transform, tta_over: dict):
    """Evaluate the test split under one TTA configuration; returns metrics."""
    from _validate_common import engine_eval

    return engine_eval(manager, cfg, test_loader, device_transform, tta_over)


def eval_inline(manager, cfg, test_loader, device_transform, steps: int, lr: float,
                focus: str = "all", scope: str = None, method: str = "tent",
                method_kw: dict = None):
    """Online protocol: Dice of the inline predictions themselves (continual
    stream over the target center). ``scope`` restricts the adapted norm set
    via tta.update_path_regex (layer-scoped Tent — late scopes truncate the
    backward; speed ladder in BASELINE.md). ``method`` picks any registered
    TTA method (tent / memo / sar / ...); ``method_kw`` carries its extra
    knobs (e.g. memo's n_views)."""
    import numpy as np
    import jax.numpy as jnp

    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.registry import get_tta_method
    from multimodal_tta_tpu.utils.config import get_config

    node = {"method": method, "steps": steps, "lr": lr, "optimizer": "sgd",
            "momentum": 0.9, "update": "norm", "episodic": False,
            "entropy_focus": focus}
    node.update(method_kw or {})
    if scope:
        node["update_path_regex"] = scope
    tta_cfg = ConfigNode(node)
    adapter = get_tta_method(method)(tta_cfg, config=cfg, mesh=manager.mesh,
                                     device_transform=device_transform)
    thr = float(get_config(cfg, "evaluation.seg.threshold", 0.3))
    ap = adapter.make_adapt_predict_fn(manager.state, threshold=thr,
                                       predict_mode="inline")
    dices, ents = [], []
    cur = manager.state
    with manager.mesh:
        for batch in test_loader:
            n = int(batch.get("_n_valid", batch["image"].shape[0]))
            cur, pred = ap(cur, jnp.asarray(batch["image"]), n)
            ents.append(float(adapter.last_entropy))
            p = np.asarray(pred)[:n].astype(np.float64)
            y = np.asarray(batch["label"])[:n].astype(np.float64)
            # per-case Dice with empty-GT gating — the seg_eval metric, so
            # this row is comparable with the engine-evaluated modes
            for i in range(n):
                denom = p[i].sum() + y[i].sum()
                if y[i].sum() > 0:
                    dices.append(2.0 * (p[i] * y[i]).sum() / max(denom, 1.0))
    return {"avg_dc": float(np.mean(dices)) if dices else 0.0,
            "entropy": float(np.mean(ents)) if ents else None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--steps-list", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--lrs", type=float, nargs="+", default=[1e-3, 1e-2])
    ap.add_argument("--focus-list", nargs="+", default=["all", "uncertain"],
                    help="tta.entropy_focus values to sweep")
    ap.add_argument("--resume", default=None,
                    help="checkpoint path (sans extension) — skip training")
    ap.add_argument("--fixture", default=os.path.join(REPO_ROOT, ".tta_validate_fixture"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--model", default="unet",
                    help="source model to train/adapt (unet | unet_ws | ...)")
    ap.add_argument("--scope-list", nargs="*", default=None,
                    help="tta.update_path_regex values for the layer-scoped "
                         "Tent sweep (quality side of the BASELINE.md speed "
                         "ladder). When given, ONLY the scope comparison runs: "
                         "no-adapt + full-norm + each scope, online-inline and "
                         "episodic, over --steps-list x --lrs.")
    ap.add_argument("--method", default="tent",
                    help="registered TTA method for the main sweep "
                         "(tent | memo | sar | eata | cotta | norm)")
    ap.add_argument("--method-kw", action="append", default=[],
                    help="extra tta.<k>=<v> knobs for --method, repeatable "
                         "(e.g. --method-kw n_views=4); values parse as YAML "
                         "scalars")
    ap.add_argument("--eval-batch", type=int, default=8,
                    help="evaluation/adaptation batch size. Multi-view "
                         "methods need headroom: memo n_views=4 steps=8 at "
                         "whole-volume batch 8 exceeds one v5e chip's HBM by "
                         "a measured 5.0G — use 4 there")
    ap.add_argument("--train-extra", nargs="*", default=[],
                    help="extra config overrides for source training (e.g. "
                         "model.remat=true training.batch_size=4 — swin at "
                         "batch 8 no-remat measured 0.4G over one chip's "
                         "HBM)")
    ap.add_argument("--seed", type=int, default=None,
                    help="task.seed for source training (seed-variance "
                         "protocol); also suffixes the saved checkpoint "
                         "(source_ckpt_seed<N>) so seeds don't clobber")
    ap.add_argument("--flip-axes", type=int, nargs="+", default=None,
                    help="enable flip-averaged TTA at evaluation "
                         "(evaluation.flip_tta, NDHWC spatial axes 1..3) "
                         "for EVERY arm of this run — measures what the "
                         "2^k mirror ensemble buys, alone (no_adapt row) "
                         "and composed with adaptation")
    args = ap.parse_args()
    if args.out:
        # pin before bring_up's run-dir chdir (same class of bug as the r4
        # resume-path pin): a relative --out must not crash the final write
        # after an hours-long sweep
        args.out = os.path.abspath(args.out)

    import yaml

    method_kw = {}
    for kv in args.method_kw:
        k, _, v = kv.partition("=")
        method_kw[k] = yaml.safe_load(v)

    manifest = ensure_fixture(args.fixture)
    manager, cfg = train_source(manifest, args.epochs, os.path.join(args.fixture, "runs"),
                                resume=args.resume, model=args.model,
                                eval_batch=args.eval_batch, seed=args.seed,
                                extra=args.train_extra)
    if args.flip_axes:
        from multimodal_tta_tpu.conf import ConfigNode

        cfg.evaluation.flip_tta = ConfigNode(
            {"enable": True, "axes": [int(a) for a in args.flip_axes]})
        print(f"[validate_tta] flip-TTA on, axes={args.flip_axes}", file=sys.stderr)
    if not args.resume:
        # persist the source model so later sweeps (--resume) skip training
        from multimodal_tta_tpu.core.checkpoint import save_checkpoint

        ckpt = os.path.join(args.fixture, "runs",
                            "source_ckpt" if args.model == "unet"
                            else f"source_ckpt_{args.model}")
        if args.seed is not None:
            ckpt += f"_seed{args.seed}"
        save_checkpoint(ckpt, manager.state)
        print(f"[validate_tta] source checkpoint saved: {ckpt}", file=sys.stderr)

    from _validate_common import device_transform_of

    test_loader = manager._builder.get_loader("test")
    device_transform = device_transform_of(manager)

    rows = []
    val_loader = manager._builder.get_loader("val")
    if val_loader is not None:
        m = eval_mode(manager, cfg, val_loader, device_transform, {"method": "none"})
        rows.append({"mode": "source_val_reference",
                     "avg_dc": round(float(m.get("avg_dc", 0.0)), 4)})
        print(json.dumps(rows[-1]))

    m = eval_mode(manager, cfg, test_loader, device_transform, {"method": "none"})
    no_adapt = round(float(m.get("avg_dc", 0.0)), 4)
    rows.append({"mode": "no_adapt", "avg_dc": no_adapt})
    print(json.dumps(rows[-1]))

    if args.scope_list is not None:
        # layer-scoped Tent: quality side of the speed ladder. "" = the
        # full norm set (the reference point each scope is judged against).
        scope_focus = args.focus_list[0]
        for scope in [""] + list(args.scope_list):
            for steps in args.steps_list:
                for lr in args.lrs:
                    tta = dict(method="tent", steps=steps, lr=lr,
                               optimizer="sgd", momentum=0.9, update="norm",
                               episodic=True, entropy_focus=scope_focus,
                               modality_dropout={"enabled": False})
                    if scope:
                        tta["update_path_regex"] = scope
                    m = eval_mode(manager, cfg, test_loader, device_transform, tta)
                    row = {"mode": "tent_episodic", "scope": scope or "full",
                           "focus": scope_focus, "steps": steps, "lr": lr,
                           "avg_dc": round(float(m.get("avg_dc", 0.0)), 4)}
                    row["delta_vs_no_adapt"] = round(row["avg_dc"] - no_adapt, 4)
                    rows.append(row)
                    print(json.dumps(row))
                    m = eval_inline(manager, cfg, test_loader, device_transform,
                                    steps, lr, scope_focus, scope=scope or None)
                    row = {"mode": "tent_online_inline", "scope": scope or "full",
                           "focus": scope_focus, "steps": steps, "lr": lr,
                           "avg_dc": round(float(m["avg_dc"]), 4),
                           "entropy": round(m["entropy"], 5) if m.get("entropy") is not None else None}
                    row["delta_vs_no_adapt"] = round(row["avg_dc"] - no_adapt, 4)
                    rows.append(row)
                    print(json.dumps(row))
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"rows": rows}, f, indent=2)
        return

    best = {"delta": 0.0, "mode": "no_adapt"}
    meth = args.method
    for focus in args.focus_list:
        for steps in args.steps_list:
            for lr in args.lrs:
                base = dict(steps=steps, lr=lr, optimizer="sgd", momentum=0.9,
                            update="norm", entropy_focus=focus,
                            modality_dropout={"enabled": False}, **method_kw)
                for name, tta in (
                    (f"{meth}_episodic", {"method": meth, "episodic": True, **base}),
                    (f"{meth}_continual", {"method": meth, "episodic": False, **base}),
                ):
                    m = eval_mode(manager, cfg, test_loader, device_transform, tta)
                    row = {"mode": name, "focus": focus, "steps": steps, "lr": lr,
                           "avg_dc": round(float(m.get("avg_dc", 0.0)), 4)}
                    row["delta_vs_no_adapt"] = round(row["avg_dc"] - no_adapt, 4)
                    rows.append(row)
                    print(json.dumps(row))
                    if row["delta_vs_no_adapt"] > best["delta"]:
                        best = {"delta": row["delta_vs_no_adapt"], "mode": name,
                                "focus": focus, "steps": steps, "lr": lr}
                m = eval_inline(manager, cfg, test_loader, device_transform,
                                steps, lr, focus, method=meth,
                                method_kw=method_kw)
                row = {"mode": f"{meth}_online_inline", "focus": focus, "steps": steps,
                       "lr": lr, "avg_dc": round(float(m["avg_dc"]), 4),
                       "entropy": round(m["entropy"], 5) if m.get("entropy") is not None else None}
                row["delta_vs_no_adapt"] = round(row["avg_dc"] - no_adapt, 4)
                rows.append(row)
                print(json.dumps(row))
                if row["delta_vs_no_adapt"] > best["delta"]:
                    best = {"delta": row["delta_vs_no_adapt"],
                            "mode": f"{meth}_online_inline", "focus": focus,
                            "steps": steps, "lr": lr}

    verdict = {"no_adapt_avg_dc": no_adapt, "best": best}
    print(json.dumps(verdict))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "verdict": verdict}, f, indent=2)


if __name__ == "__main__":
    main()
