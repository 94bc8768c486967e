"""Streaming continual-TTA protocol validation (BASELINE config #5).

An ordered multi-domain test stream — center CHUP (scanner shift A), then
center CHMR (a different shift B) — served with online Tent under each
reset policy of ``tta/stream.py``, reporting Dice per stream position and
per domain, plus re-anchor events. Two regimes:

  - the measured operating point (steps=4, lr=0.05, focus=uncertain —
    BASELINE.md adaptation-quality table), where the question is whether a
    policy keeps the recovery across the A->B domain boundary, and
  - the measured collapse regime (steps=16, lr=0.1 continual, where plain
    continual Tent fell to Dice 0.29), where the question is whether the
    entropy watchdog prevents the collapse.

    python scripts/validate_stream_tta.py [--epochs 24] [--out r.json] \
        [--resume <ckpt-sans-extension>]

The reference repo has only the per-domain metric machinery this protocol
feeds (reference: src/evaluation/seg_eval.py:362-392); the streaming
control + guard are new capability.
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

apply_platform_env()
enable_compilation_cache()

# Two DIFFERENT scanner shifts: the A->B boundary must be a real domain
# change, not more of the same. A = the validate_tta.py shift; B = opposite
# CT gain direction, milder PET nonlinearity, stronger bias field.
SHIFTS = {
    "CHUP": {
        "bias_field": 0.6,
        "ct_gain": 1.3,
        "ct_bias": 80.0,
        "pt_gamma": 2.0,
        "pt_gain": 0.6,
        "noise": 150.0,
    },
    "CHMR": {
        "bias_field": 0.8,
        "ct_gain": 0.75,
        "ct_bias": -60.0,
        "pt_gamma": 1.4,
        "pt_gain": 1.5,
        "noise": 100.0,
    },
}

STREAM_ORDER = ["CHUP", "CHMR"]

# per-parameter identity (no-shift) values, for --shift-amp extrapolation
_SHIFT_IDENTITY = {
    "bias_field": 0.0, "ct_gain": 1.0, "ct_bias": 0.0,
    "pt_gamma": 1.0, "pt_gain": 1.0, "noise": 0.0,
}


def scaled_shifts(amp: float) -> dict:
    """Interpolate/extrapolate every shift parameter away from identity by
    ``amp`` (1.0 = the standard SHIFTS). The gate quality protocol needs a
    STRONGLY-adaptable stream (always_adapt - no_adapt >= 0.05, VERDICT r4
    weak #2) — amp > 1 deepens the no-adapt hole so the gate's quality cost
    is measurable above the +-0.05 seed noise."""
    return {
        c: {k: _SHIFT_IDENTITY[k] + amp * (v - _SHIFT_IDENTITY[k])
            for k, v in d.items()}
        for c, d in SHIFTS.items()
    }


def ensure_fixture(root: str, shape=(144, 144, 48), per_center: int = 16,
                   shift_amp: float = 1.0) -> str:
    manifest = os.path.join(root, "manifest.csv")
    if os.path.exists(manifest):
        return manifest
    from multimodal_tta_tpu.data.synthetic import make_hecktor_fixture

    print(f"[stream_tta] generating two-shift fixture (amp={shift_amp}) ...",
          file=sys.stderr)
    small = min(shape) < 48
    return make_hecktor_fixture(
        root,
        centers={c: per_center for c in ["CHGJ", "CHUS", "CHUM", "CHUP", "CHMR"]},
        shape=tuple(shape),
        seed=11,
        n_lesions=(1, 3) if not small else (1, 1),
        radius_range=(4.0, 9.0) if not small else (3.0, 4.0),
        lesion_contrast=(150.0, 4.0),  # low contrast: non-degenerate entropy
        domain_shift=scaled_shifts(shift_amp),
    )


def train_source(manifest: str, epochs: int, out_root: str, resume=None,
                 shape=(144, 144, 48), eval_batch_size=8, seed=None):
    from _validate_common import bring_up

    x, y, z = shape
    overrides = [
        "task=hecktor21",
        "dataset=hecktor21",
        "model=unet",
        f"dataset.manifest_csv={manifest}",
        f"dataset.expected_shape=[{x},{y},{z}]",
        f"training.data.transforms.image_size=[{z},{y},{x}]",
        "dataset.target_center=CHUP,CHMR",  # both stream domains held out
        "dataset.val_per_center=2",
        "dataset.cache_in_memory=true",
        f"training.epochs={epochs}",
        "training.batch_size=8",
        f"training.eval_batch_size={eval_batch_size}",
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
        "task.run_name=stream_tta_validate",
    ]
    if seed is not None:
        # seed-variance protocol (BASELINE.md N=3 stream tables): seeds the
        # init + batch schedule; the split stays pinned (split_seed)
        overrides.append(f"task.seed={int(seed)}")
    return bring_up(overrides, resume=resume, tag="stream_tta")


def stream_batches(manager):
    """Ordered stream: every batch of domain A, then every batch of B.
    Yields (domain, batch)."""
    for center in STREAM_ORDER:
        loader = manager._builder.get_loader("test", target_center=center)
        for batch in loader:
            yield center, batch


def gated_stream(manager, suffix: bool = False, chup_epochs: int = 1):
    """The serving shape the entropy gate exists for: the stream OPENS on the
    source distribution (val batches of the source centers), drifts to the
    shifted CHUP center, and (optionally) returns in-domain — so the right
    behavior is forward-only -> escalate at the boundary -> re-probe back.

    chup_epochs repeats the drifted segment (a SUSTAINED drift period):
    with one 8-case batch of CHUP, continual adaptation gets exactly one
    update before the stream ends and always_adapt cannot separate from
    no_adapt (measured +0.008 — r5 pilot); the gate's quality question
    needs a drift long enough for adaptation to matter."""
    for batch in manager._builder.get_loader("val"):
        yield "SRC", batch
    for _ in range(int(chup_epochs)):
        for batch in manager._builder.get_loader("test", target_center="CHUP"):
            yield "CHUP", batch
    if suffix:
        for batch in manager._builder.get_loader("val"):
            yield "SRC_return", batch


def run_policy(manager, cfg, device_transform, *, policy, guard, steps, lr,
               threshold=0.3, floor_ratio=0.2, early_stop_ratio=None,
               restore_prob=None, rel_margin=None, method="tent",
               ema=0.999, n_views=2, node_extra=None,
               gate_ratio=None, period=0, stream=None):
    """One pass over the ordered stream under one controller config."""
    from multimodal_tta_tpu.conf import ConfigNode
    from multimodal_tta_tpu.registry import get_tta_method
    from multimodal_tta_tpu.tta import StreamTTAController
    from multimodal_tta_tpu.tta.stream import evaluate_stream

    node = {"method": method, "steps": steps, "lr": lr, "optimizer": "sgd",
            "momentum": 0.9, "update": "norm", "episodic": False,
            "entropy_focus": "uncertain"}
    if method == "cotta":
        node.update({"ema": ema, "n_views": n_views, "serve": "teacher"})
        del node["entropy_focus"]  # cotta's objective is teacher CE
    if node_extra:
        node.update(node_extra)
    if early_stop_ratio is not None:
        node["early_stop"] = {"enabled": True, "entropy_floor_ratio": early_stop_ratio}
    if restore_prob is not None:
        node["restore"] = {"enabled": True, "prob": restore_prob}
    if rel_margin is not None:
        node["reliability"] = {"enabled": True, "margin_ratio": rel_margin}
    tta_cfg = ConfigNode(node)
    adapter = get_tta_method(method)(tta_cfg, config=cfg, mesh=manager.mesh,
                                     device_transform=device_transform)
    ctrl = StreamTTAController(
        adapter, manager.state, threshold=threshold, policy=policy,
        guard=guard, entropy_floor_ratio=floor_ratio, predict_mode="inline",
        gate=gate_ratio is not None,
        gate_ratio=gate_ratio if gate_ratio is not None else 1.5,
        periodic_reanchor_every=period,
    )
    with manager.mesh:
        row = evaluate_stream(ctrl, stream if stream is not None else stream_batches(manager))
    row.update({"steps": steps, "lr": lr})
    if gate_ratio is not None:
        row["gate_ratio"] = gate_ratio
    if method != "tent":
        row["policy"] = f"{method}:{row['policy']}"
        if method == "cotta":
            row["ema"] = ema
    if getattr(adapter, "fisher_enabled", False):
        row["fisher_lambda"] = adapter.fisher_lambda
    if guard:
        row["floor"] = floor_ratio
    if early_stop_ratio is not None:
        row["policy"] += "+early_stop"
        row["early_stop"] = early_stop_ratio
    if restore_prob is not None:
        row["policy"] += "+restore"
        row["restore"] = restore_prob
    if rel_margin is not None:
        row["policy"] += "+rel"
        row["rel_margin"] = rel_margin
    return row


def run_no_adapt(manager, cfg, device_transform, threshold=0.3, stream=None):
    import numpy as np
    import jax

    from multimodal_tta_tpu.ops.intensity import make_intensity_normalizer
    from multimodal_tta_tpu.tta.stream import binary_dice_per_case
    import jax.numpy as jnp

    norm_fn = None
    if device_transform and device_transform.get("normalize"):
        norm_fn = make_intensity_normalizer(
            normalize=True,
            intensity_policy=device_transform.get("intensity_policy"),
            channel_names=device_transform.get("channel_names"),
            mean=device_transform.get("mean"),
            std=device_transform.get("std"),
        )

    state = manager.state

    @jax.jit
    def predict(variables_params, batch_stats, x):
        x = x.astype(jnp.float32)
        if norm_fn is not None:
            x = jax.vmap(norm_fn)(x)
        variables = {"params": variables_params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = state.apply_fn(variables, x, train=False)
        return (jax.nn.sigmoid(logits) >= threshold).astype(jnp.uint8)

    per_domain = {}
    with manager.mesh:
        for domain, batch in (stream if stream is not None else stream_batches(manager)):
            n = int(batch.get("_n_valid", batch["image"].shape[0]))
            pred = predict(state.params, state.batch_stats, jnp.asarray(batch["image"]))
            per_domain.setdefault(domain, []).extend(binary_dice_per_case(pred, batch["label"], n))
    row = {"policy": "no_adapt",
           "avg_dc": round(float(np.mean([d for v in per_domain.values() for d in v])), 4)}
    for dom, v in per_domain.items():
        row[f"dom/{dom}/avg_dc"] = round(float(np.mean(v)), 4)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--collapse-steps", type=int, default=16)
    ap.add_argument("--collapse-lr", type=float, default=0.1)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--fixture", default=os.path.join(REPO_ROOT, ".stream_tta_fixture"))
    ap.add_argument("--shape", type=int, nargs=3, default=[144, 144, 48],
                    help="fixture volume shape X Y Z (small values = smoke test)")
    ap.add_argument("--per-center", type=int, default=16)
    ap.add_argument("--shift-amp", type=float, default=1.0,
                    help="scale the domain-shift strength away from identity "
                         "(fixture-generation time only; an existing "
                         "manifest wins)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--gate", action="store_true",
                    help="entropy-gated serving protocol (tta.stream.gate): "
                         "in-domain prefix -> shifted CHUP -> in-domain "
                         "return; gated arms + no-adapt/always-adapt "
                         "controls instead of the full policy table")
    ap.add_argument("--gate-ratio", type=float, default=1.5)
    ap.add_argument("--gate-chup-epochs", type=int, default=3,
                    help="repeats of the drifted CHUP segment in the gated "
                         "stream (sustained drift; see gated_stream)")
    ap.add_argument("--seed", type=int, default=None,
                    help="task.seed for source training (seed-variance "
                         "protocol); suffixes the saved checkpoint")
    ap.add_argument("--defenses", action="store_true",
                    help="compact defense-default arms only (collapse guard, "
                         "restore p, fisher lambda=1) — the N>=3 "
                         "seed-variance protocol")
    ap.add_argument("--scope", default=None,
                    help="tta.update_path_regex for a FOCUSED scoped-vs-full "
                         "comparison (layer-scoped Tent, BASELINE.md ladder): "
                         "runs no-adapt + {full, scoped} x {operating point, "
                         "collapse regime} instead of the full policy table")
    args = ap.parse_args()
    if args.out:
        # pin before bring_up's run-dir chdir (same class of bug as the r4
        # resume-path pin): a relative --out must not crash the final write
        # after an hours-long sweep
        args.out = os.path.abspath(args.out)

    manifest = ensure_fixture(args.fixture, shape=tuple(args.shape),
                              per_center=args.per_center,
                              shift_amp=args.shift_amp)
    manager, cfg = train_source(
        manifest, args.epochs, os.path.join(args.fixture, "runs"),
        resume=args.resume, shape=tuple(args.shape), seed=args.seed,
    )
    if not args.resume:
        # persist the source model so later sweeps (--resume) skip training
        from multimodal_tta_tpu.core.checkpoint import save_checkpoint

        ckpt = os.path.join(args.fixture, "runs", "source_ckpt")
        if args.seed is not None:
            ckpt += f"_seed{args.seed}"
        save_checkpoint(ckpt, manager.state)
        print(f"[stream_tta] source checkpoint saved: {ckpt}", file=sys.stderr)

    from _validate_common import device_transform_of

    device_transform = device_transform_of(manager)
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps({k: v for k, v in row.items() if k != "positions"}))

    if args.gate:
        # Entropy-gated serving (tta.stream.gate): the claims under test are
        # (1) the in-domain prefix is served forward-only (no backward paid),
        # (2) escalation lands exactly at the domain boundary, (3) shifted
        # quality matches always-adapt, (4) with a periodic re-probe the
        # mode TRACKS the domain — forward again once the stream returns
        # in-domain. Quality control arms: no-adapt and always-adapt over
        # the identical stream.
        op = dict(steps=args.steps, lr=args.lr)
        emit({**run_no_adapt(manager, cfg, device_transform,
                             stream=gated_stream(manager, suffix=True, chup_epochs=args.gate_chup_epochs)),
              "arm": "no_adapt"})
        row = run_policy(manager, cfg, device_transform, policy="continual",
                         guard=True, stream=gated_stream(manager, suffix=True, chup_epochs=args.gate_chup_epochs), **op)
        emit({**row, "arm": "always_adapt"})
        row = run_policy(manager, cfg, device_transform, policy="continual",
                         guard=True, gate_ratio=args.gate_ratio,
                         stream=gated_stream(manager, suffix=True, chup_epochs=args.gate_chup_epochs), **op)
        emit({**row, "arm": "gated"})
        row = run_policy(manager, cfg, device_transform, policy="continual",
                         guard=True, gate_ratio=args.gate_ratio, period=2,
                         stream=gated_stream(manager, suffix=True, chup_epochs=args.gate_chup_epochs), **op)
        emit({**row, "arm": "gated_reprobe_every2"})

        gated = rows[2]
        fwd = gated.get("gate/forward_batches", 0)
        adp = gated.get("gate/adapt_batches", 0)
        verdict = {
            "no_adapt_CHUP": rows[0].get("dom/CHUP/avg_dc"),
            "always_adapt_CHUP": rows[1].get("dom/CHUP/avg_dc"),
            "gated_CHUP": gated.get("dom/CHUP/avg_dc"),
            "gated_SRC": gated.get("dom/SRC/avg_dc"),
            "forward_batches": fwd,
            "adapt_batches": adp,
            "escalations": gated.get("gate/escalations"),
            "reprobe_modes": [p["mode"] for p in rows[3]["positions"]],
            "reprobe_SRC_return": rows[3].get("dom/SRC_return/avg_dc"),
        }
        print(json.dumps(verdict))
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"rows": rows, "verdict": verdict}, f, indent=2)
        return

    emit(run_no_adapt(manager, cfg, device_transform))

    if args.defenses:
        # Compact defense-default arms for the N>=3 seed-variance protocol
        # (BASELINE stream tables; VERDICT r3 weak #6): the arms whose
        # outcomes gate shipped defaults — operating point, collapse +
        # watchdog rescue, stochastic restore p=0.01/0.05, restore at the
        # operating point (cost check), and the Fisher anchor at its
        # shipped lambda=1.
        op = dict(steps=args.steps, lr=args.lr)
        cl = dict(steps=args.collapse_steps, lr=args.collapse_lr)
        emit({**run_policy(manager, cfg, device_transform, policy="continual",
                           guard=False, **op), "arm": "op_plain"})
        emit({**run_policy(manager, cfg, device_transform, policy="continual",
                           guard=True, **op), "arm": "op_guard"})
        emit({**run_policy(manager, cfg, device_transform, policy="continual",
                           guard=False, **cl), "arm": "collapse_plain"})
        emit({**run_policy(manager, cfg, device_transform, policy="continual",
                           guard=True, floor_ratio=0.5, **cl), "arm": "collapse_guard.5"})
        emit({**run_policy(manager, cfg, device_transform, policy="continual",
                           guard=False, restore_prob=0.01, **cl), "arm": "collapse_restore.01"})
        emit({**run_policy(manager, cfg, device_transform, policy="continual",
                           guard=False, restore_prob=0.05, **cl), "arm": "collapse_restore.05"})
        emit({**run_policy(manager, cfg, device_transform, policy="continual",
                           guard=True, restore_prob=0.01, **op), "arm": "op_restore.01"})
        emit({**run_policy(manager, cfg, device_transform, policy="continual",
                           guard=False, method="eata", rel_margin=0.7,
                           node_extra={"fisher": {"enabled": True, "lambda": 1.0}},
                           **op), "arm": "op_fisher_l1"})
        # SAR in the collapse regime: its in-scan recovery reset is the
        # anti-collapse mechanism the method exists for (quality at the
        # operating point measured Tent-equivalent at 2x grad cost —
        # BASELINE SAR section); margin 0.7 passes the ~0.55-scoring stream
        emit({**run_policy(manager, cfg, device_transform, policy="continual",
                           guard=False, method="sar",
                           node_extra={"margin_ratio": 0.7}, **cl),
              "arm": "collapse_sar"})
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"rows": rows}, f, indent=2)
        return

    if args.scope:
        # scoped-Tent drift question: does restricting the adapted set to
        # the decoder tail (4 affine tensors instead of 36) also bound
        # over-adaptation drift — fewer degrees of freedom to collapse into?
        for label, extra in (("full", None),
                             ("scoped", {"update_path_regex": args.scope})):
            for regime, s, l in (("operating", args.steps, args.lr),
                                 ("collapse", args.collapse_steps, args.collapse_lr)):
                row = run_policy(manager, cfg, device_transform,
                                 policy="continual", guard=False,
                                 steps=s, lr=l, node_extra=extra)
                row.update({"scope": label, "regime": regime})
                emit(row)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(rows, f, indent=2)
        return

    op = dict(steps=args.steps, lr=args.lr)
    emit(run_policy(manager, cfg, device_transform, policy="episodic", guard=False, **op))
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False, **op))
    emit(run_policy(manager, cfg, device_transform,
                    policy="reset_on_domain_change", guard=False, **op))
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=True, **op))

    # collapse regime: plain continual collapses (BASELINE Dice 0.29); the
    # watchdog must prevent it
    cl = dict(steps=args.collapse_steps, lr=args.collapse_lr)
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False, **cl))
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=True, **cl))
    # tighter watchdog: the default 0.2 floor fires only after substantial
    # damage at this regime (16 inner steps over-adapt within single
    # batches); 0.5 re-anchors at the first sign
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=True,
                    floor_ratio=0.5, **cl))
    # in-batch brake: tta.early_stop freezes the inner scan at the entropy
    # floor — acts WITHIN the 16-step scan where the watchdog cannot
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    early_stop_ratio=0.3, **cl))
    # entropy lags the Dice damage in this regime (measured: CHUP already at
    # 0.31 Dice while entropy only halves), so a conservative floor is the
    # effective brake setting
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    early_stop_ratio=0.6, **cl))
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=True,
                    floor_ratio=0.5, early_stop_ratio=0.6, **cl))
    # CoTTA-style stochastic restore: a per-element, per-step leak toward
    # source — unlike the entropy-triggered defenses it needs no lagging
    # entropy signal, so it is the candidate defense for the regime where
    # entropy lags the Dice damage
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    restore_prob=0.01, **cl))
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    restore_prob=0.05, **cl))
    # EATA-style reliability gate: skip batches whose self-normalized
    # entropy says adaptation would be noise
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    rel_margin=0.4, **cl))
    # do the defenses cost anything at the measured OPERATING point?
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=True,
                    restore_prob=0.01, **op))
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=True,
                    rel_margin=0.4, **op))
    # CoTTA EMA-teacher (method cotta): the teacher's slow-moving
    # pseudo-labels are a structural collapse defense — the objective chases
    # the EMA model, not a degenerate entropy minimum. Full recipe =
    # teacher + stochastic restore. n_views=2 with the flip+noise view
    # family: views=1 (clean-view teacher) is a structural fixed point
    # (student == teacher ⇒ zero CE gradient — tests/test_tta.py::
    # TestCotta::test_views1_clean_is_a_fixed_point), and affine-only views
    # are cancelled by InstanceNorm. Measured r3: views=2 steps=4 fits one
    # v5e chip at whole-volume batch 8 (1.92 s/batch) — the earlier
    # scale/shift-only recipe's 4.46M OOM does not reproduce with the
    # flip-based views.
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    method="cotta", n_views=2, **op))
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    method="cotta", n_views=2, **cl))
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    method="cotta", n_views=2, restore_prob=0.01, **cl))

    # EATA (tta/eata.py): reliability gate + proximal Fisher anchor. On this
    # fixture the default 0.4 gate excludes every volume (measured above), so
    # the gate is opened to 0.7 (passes everything — the tent margin-0.7 rows
    # are the controls) and the question becomes whether the Fisher anchor
    # ALONE does what the gate structurally cannot: bound over-adaptation
    # drift. lambda sweeps the anchor strength; the per-step proximal
    # coefficient is lr*lambda*omega with omega mean-normalized to 1.
    for lam in (10.0, 100.0):
        emit(run_policy(manager, cfg, device_transform, policy="continual",
                        guard=False, method="eata", rel_margin=0.7,
                        node_extra={"fisher": {"enabled": True, "lambda": lam}},
                        **op))
        emit(run_policy(manager, cfg, device_transform, policy="continual",
                        guard=False, method="eata", rel_margin=0.7,
                        node_extra={"fisher": {"enabled": True, "lambda": lam}},
                        **cl))

    # SAR (tta/sar.py): sharpness-aware steps + in-scan recovery resets. The
    # reliable filter (margin 0.4*H_max, the paper's constant) skips batches
    # the source model is too uncertain on; the recovery EMA is the built-in
    # collapse defense — measured here against the same two regimes
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    method="sar", **op))
    emit(run_policy(manager, cfg, device_transform, policy="continual", guard=False,
                    method="sar", **cl))

    no_adapt = rows[0]["avg_dc"]
    cl_rows = [r for r in rows if r.get("steps") == args.collapse_steps]
    collapse = cl_rows[0]["avg_dc"]
    guarded = max(r["avg_dc"] for r in cl_rows[1:])
    verdict = {
        "no_adapt": no_adapt,
        "best_policy": max(rows[1:5], key=lambda r: r["avg_dc"])["policy"],
        "best_avg_dc": max(r["avg_dc"] for r in rows[1:5]),
        "collapse_unguarded": collapse,
        "collapse_guarded": guarded,
        "guard_rescue": round(guarded - collapse, 4),
    }
    print(json.dumps(verdict))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "verdict": verdict}, f, indent=2)


if __name__ == "__main__":
    main()
