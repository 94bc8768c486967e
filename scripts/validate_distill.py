"""Knowledge-distillation validation: does a flagship-unet teacher buy back
the unet_ws student's Dice gap at zero serving cost? (core/distill.py)

Protocol (same hard HECKTOR fixture + recipe as validate_unet_ws.py):
  1. train the TEACHER (unet) and save its final weights;
  2. train the STUDENT (unet_ws) plain — the control;
  3. train the SAME student with training.distill from the teacher;
identical seeds/recipe throughout, compare best val Dice. Run on the TPU:

    python scripts/validate_distill.py [--epochs 24] [--student unet_ws]
        [--temps 2.0] [--weights 1.0] [--out results.json]

Prints one JSON line per run and a verdict with the gap-closure fraction.
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


def ensure_fixture(root: str) -> str:
    manifest = os.path.join(root, "manifest.csv")
    if os.path.exists(manifest):
        return manifest
    from multimodal_tta_tpu.data.synthetic import make_hecktor_fixture

    print("[validate_distill] generating hard fixture ...", file=sys.stderr)
    return make_hecktor_fixture(
        root,
        centers={"CHGJ": 16, "CHUS": 16, "CHUM": 16, "CHUP": 8},
        shape=(144, 144, 48),
        seed=7,
        n_lesions=(1, 3),
        radius_range=(2.5, 9.0),
    )


def base_overrides(model_name: str, manifest: str, epochs: int, out_root: str, run: str):
    return [
        "task=hecktor21",
        "dataset=hecktor21",
        "model=unet",
        f"model.name={model_name}",
        f"dataset.manifest_csv={manifest}",
        "dataset.expected_shape=[144,144,48]",
        "dataset.target_center=CHUP",
        "dataset.val_per_center=2",
        "dataset.cache_in_memory=true",
        f"training.epochs={epochs}",
        "training.batch_size=8",
        "training.eval_batch_size=8",
        "training.num_workers=8",
        "training.optimizer=adam",
        "training.optimizers.adam.lr=1e-3",
        "training.eval_test.start_epoch=0",
        f"training.eval_test.every_n_epochs={max(epochs // 4, 1)}",
        "training.eval_test.run_last=true",
        "training.eval_test.do_test=false",
        "training.model_save_start=9999",
        f"task.save_dir={out_root}",
        f"task.run_name={run}",
    ]


def summarize(name: str, manager) -> dict:
    results = manager.last_train_results
    wall = manager.last_train_wall_s
    evals = results.get("eval_history", [])
    best = max((e.get("avg_dc", 0.0) for e in evals), default=0.0)
    return {
        "run": name,
        "best_val_avg_dc": round(float(best), 4),
        "final_val_avg_dc": round(float(evals[-1].get("avg_dc", 0.0)) if evals else 0.0, 4),
        "wall_s": round(wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--student", default="unet_ws")
    ap.add_argument("--teacher", default="unet")
    ap.add_argument("--temps", type=float, nargs="+", default=[2.0])
    ap.add_argument("--weights", type=float, nargs="+", default=[1.0])
    ap.add_argument("--focus", nargs="+", default=["all"],
                    help="kd focus modes to sweep (all / uncertain)")
    ap.add_argument("--skip-plain", action="store_true",
                    help="reuse a previously-measured plain-student Dice "
                         "(pass via --plain-best) instead of retraining it")
    ap.add_argument("--plain-best", type=float, default=None)
    ap.add_argument("--teacher-best", type=float, default=None,
                    help="previously-measured teacher Dice (for the verdict "
                         "when --teacher-ckpt skips teacher training)")
    ap.add_argument("--fixture", default=os.path.join(REPO_ROOT, ".ws_validate_fixture"))
    ap.add_argument("--teacher-ckpt", default=None,
                    help="skip teacher training; use this checkpoint (extension-less)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from _validate_common import bring_up

    manifest = ensure_fixture(args.fixture)
    out_root = os.path.join(args.fixture, "runs")
    rows = []

    # 1. teacher ------------------------------------------------------------
    ckpt = args.teacher_ckpt
    teacher_model_node = None
    if ckpt:
        # still need the teacher's composed model node for distill.model;
        # compose without training by resuming the given checkpoint
        mgr_t, cfg_t = bring_up(
            base_overrides(args.teacher, manifest, args.epochs, out_root, "distill_teacher"),
            resume=ckpt, tag="distill_teacher")
        teacher_model_node = cfg_t.model.to_container()
    else:
        mgr_t, cfg_t = bring_up(
            base_overrides(args.teacher, manifest, args.epochs, out_root, "distill_teacher"),
            tag="distill_teacher")
        teacher_model_node = cfg_t.model.to_container()
        row = summarize(f"teacher_{args.teacher}", mgr_t)
        rows.append(row)
        print(json.dumps(row))
        from multimodal_tta_tpu.core.checkpoint import save_checkpoint

        ckpt = os.path.join(out_root, "distill_teacher_ckpt")
        save_checkpoint(ckpt, mgr_t.state)
        print(f"[validate_distill] teacher checkpoint: {ckpt}", file=sys.stderr)
    teacher_best = rows[0]["best_val_avg_dc"] if rows else args.teacher_best

    # 2. plain student (control) --------------------------------------------
    if args.skip_plain and args.plain_best is not None:
        plain_best = float(args.plain_best)
        print(json.dumps({"run": f"plain_{args.student}", "best_val_avg_dc": plain_best,
                          "reused": True}))
    else:
        mgr_s, _ = bring_up(
            base_overrides(args.student, manifest, args.epochs, out_root,
                           f"distill_plain_{args.student}"),
            tag="distill_plain")
        row = summarize(f"plain_{args.student}", mgr_s)
        rows.append(row)
        print(json.dumps(row))
        plain_best = row["best_val_avg_dc"]

    # 3. distilled student(s) -----------------------------------------------
    best_dist = None
    for temp in args.temps:
        for w in args.weights:
            for focus in args.focus:
                def mutate(cfg, _t=temp, _w=w, _f=focus):
                    cfg.training.distill = {
                        "enabled": True,
                        "checkpoint": os.path.abspath(ckpt),
                        "temperature": _t,
                        "weight": _w,
                        "focus": _f,
                        "model": teacher_model_node,
                    }

                mgr_d, _ = bring_up(
                    base_overrides(args.student, manifest, args.epochs, out_root,
                                   f"distill_kd_{args.student}_T{temp}_w{w}_{focus}"),
                    mutate_cfg=mutate, tag="distill_kd")
                row = summarize(f"distilled_{args.student}_T{temp}_w{w}_{focus}", mgr_d)
                row.update({"temperature": temp, "weight": w, "focus": focus,
                            "delta_vs_plain": round(row["best_val_avg_dc"] - plain_best, 4)})
                rows.append(row)
                print(json.dumps(row))
                if best_dist is None or row["best_val_avg_dc"] > best_dist["best_val_avg_dc"]:
                    best_dist = row

    verdict = {
        "teacher_best": teacher_best,
        "plain_student_best": plain_best,
        "distilled_student_best": best_dist["best_val_avg_dc"] if best_dist else None,
        "kd_delta": best_dist["delta_vs_plain"] if best_dist else None,
    }
    if teacher_best is not None and best_dist is not None:
        gap = teacher_best - plain_best
        verdict["teacher_gap"] = round(gap, 4)
        if abs(gap) > 1e-6:
            verdict["gap_closed_fraction"] = round(best_dist["delta_vs_plain"] / gap, 3)
    print(json.dumps(verdict))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "verdict": verdict}, f, indent=2)


if __name__ == "__main__":
    main()
