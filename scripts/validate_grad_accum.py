"""Measured gradient-accumulation row: effective batch 16 at batch-8 memory.

core/optim.py wraps the optimizer in ``optax.MultiSteps`` when
``training.grad_accum=k`` — the claim (BASELINE.md hard-part 4, the
whole-volume HBM wall) is that k microbatches of B volumes cost the
activation memory of ONE microbatch while moving the params with
effective-batch k*B gradient statistics. This script measures that claim
on the real chip for the flagship HECKTOR configuration:

    b8a1   batch 8, grad_accum 1   (the production training config)
    b8a2   batch 8, grad_accum 2   (effective batch 16)
    b16a1  batch 16, grad_accum 1  (the direct comparison point)

Each variant runs in its OWN subprocess so peak-HBM high-water marks and
a possible RESOURCE_EXHAUSTED on the direct batch-16 step are isolated.
The step is driven directly (fabricated device-resident batch, reused
across steps) so the measurement is pure step cost — no host pipeline,
no H2D per step.

    python scripts/validate_grad_accum.py [--steps 16] [--out r.json]

Prints one JSON line per variant and a final verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

VARIANTS = {
    # HECKTOR flagship (whole volume 48x144x144, 2ch, UNet3D 32..512)
    "b8a1": {"batch": 8, "accum": 1, "family": "hecktor"},
    "b8a2": {"batch": 8, "accum": 2, "family": "hecktor"},
    "b16a1": {"batch": 16, "accum": 1, "family": "hecktor"},
    # BraTS mid-fusion (whole volume 4x[160,192,160], 78.6M params, remat):
    # BASELINE.md documents the batch-1 HBM wall — grad_accum is the
    # single-chip path to an effective batch above it
    "mf_b1a1": {"batch": 1, "accum": 1, "family": "brats"},
    "mf_b1a4": {"batch": 1, "accum": 4, "family": "brats"},
    "mf_b2a1": {"batch": 2, "accum": 1, "family": "brats"},
}

FAMILIES = {
    "hecktor": {
        "overrides": ["task=hecktor21", "dataset=hecktor21", "model=unet"],
        "shape": (48, 144, 144), "in_ch": 2, "out_ch": 1,
        "order": ("b8a1", "b8a2", "b16a1"),
    },
    "brats": {
        "overrides": ["task=brats", "dataset=brats",
                      "model=unet_multimodal_midfusion"],
        "shape": (160, 192, 160), "in_ch": 4, "out_ch": 3,
        "order": ("mf_b1a1", "mf_b1a4", "mf_b2a1"),
    },
}


def run_variant(tag: str, steps: int) -> dict:
    from multimodal_tta_tpu.utils.jax_setup import (
        apply_platform_env,
        enable_compilation_cache,
    )

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import numpy as np

    from multimodal_tta_tpu.conf import compose, setup_run_dir
    from multimodal_tta_tpu.core import ExperimentManager
    from multimodal_tta_tpu.parallel.mesh import (
        data_axis_size,
        pad_batch_to_multiple,
        shard_batch,
    )
    from multimodal_tta_tpu.utils.logger import setup_logger

    spec = VARIANTS[tag]
    batch, accum = spec["batch"], spec["accum"]
    fam = FAMILIES[spec["family"]]

    overrides = fam["overrides"] + [
        f"training.batch_size={batch}",
        f"training.grad_accum={accum}",
        "training.optimizer=adam",
        "task.save_dir=outputs/validate_grad_accum",
        f"task.run_name={tag}",
    ]
    cfg = compose(os.path.join(REPO_ROOT, "configs"), "config", overrides)
    run_dir = setup_run_dir(cfg)
    setup_logger(log_file=os.path.join(run_dir, "run.log"))

    manager = ExperimentManager(cfg)
    manager.setup_model()
    manager.setup_optimizer()
    manager.setup_scheduler()
    manager.setup_trainer(run_dir)
    trainer = manager.trainer

    # fabricated whole-volume batch at the family's working shape, staged to
    # device ONCE (the step does not donate its batch operands, so the same
    # device buffers serve every step — no per-step H2D on the tunnel)
    d, h, w = fam["shape"]
    rng = np.random.default_rng(0)
    image = rng.normal(size=(batch, d, h, w, fam["in_ch"])).astype(np.float32)
    label = (rng.random(size=(batch, d, h, w, fam["out_ch"])) < 0.02).astype(np.uint8)
    with manager.mesh:
        padded, n_valid = pad_batch_to_multiple(
            {"image": image, "label": label}, data_axis_size(manager.mesh)
        )
        dev = shard_batch(padded, manager.mesh)
    dev["_n_valid"] = n_valid

    def fence():
        # on the tunneled TPU block_until_ready returns early (BASELINE.md
        # timing caveat); fetching the last step's loss scalar fences every
        # in-order step enqueued before it
        trainer.flush_step_metrics()

    result = {"variant": tag, "batch": batch, "grad_accum": accum,
              "effective_batch": batch * accum, "steps": steps}
    try:
        with manager.mesh:
            for _ in range(3):  # compile + warm
                trainer.run_step(dev)
            fence()
            t0 = time.perf_counter()
            for _ in range(steps):
                trainer.run_step(dev)
            fence()
            wall = time.perf_counter() - t0
        s_step = wall / steps
        result.update(
            status="ok",
            s_per_step=round(s_step, 4),
            vol_per_s=round(batch / s_step, 2),
            s_per_effective_batch=round(s_step * accum, 4),
        )
    except Exception as e:  # RESOURCE_EXHAUSTED lands here
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower()
        result.update(status="oom" if oom else "error", error=msg[:300])

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak is not None:
            result["peak_hbm_gib"] = round(peak / 2**30, 3)
    except Exception:
        pass
    if result.get("status") == "ok":
        # the axon backend exposes no memory_stats; the compiler's own memory
        # analysis of the already-compiled step (persistent-cache hit) gives
        # the activation (temp) and state footprints instead
        try:
            self_key = jax.random.PRNGKey(0)
            lowered = trainer._train_step.lower(
                trainer.state, dev["image"], dev["label"], self_key,
                np.int32(n_valid))
            mem = lowered.compile().memory_analysis()
            result["hbm_temp_gib"] = round(mem.temp_size_in_bytes / 2**30, 3)
            result["hbm_args_gib"] = round(
                mem.argument_size_in_bytes / 2**30, 3)
        except Exception as e:
            result["memory_analysis_error"] = str(e)[:120]
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", choices=sorted(VARIANTS), default=None)
    ap.add_argument("--family", choices=sorted(FAMILIES), default="hecktor")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.one:
        r = run_variant(args.one, args.steps)
        print(json.dumps(r))
        return

    rows = []
    base_tag, accum_tag, direct_tag = FAMILIES[args.family]["order"]
    for tag in (base_tag, accum_tag, direct_tag):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", tag,
             "--steps", str(args.steps)],
            capture_output=True, text=True, cwd=REPO_ROOT, timeout=1800,
        )
        line = next(
            (l for l in reversed(proc.stdout.strip().splitlines())
             if l.startswith("{")), None)
        if line is None:
            rows.append({"variant": tag, "status": "crashed",
                         "stderr_tail": proc.stderr[-300:]})
        else:
            rows.append(json.loads(line))
        print(json.dumps(rows[-1]), flush=True)

    by = {r["variant"]: r for r in rows}
    verdict = {"verdict": f"grad_accum/{args.family}"}
    a1, a2 = by.get(base_tag, {}), by.get(accum_tag, {})
    direct = by.get(direct_tag, {})
    if a1.get("status") == "ok" and a2.get("status") == "ok":
        # the accumulation tax: a microstep should cost ~a plain step
        verdict["microstep_overhead_pct"] = round(
            100.0 * (a2["s_per_step"] / a1["s_per_step"] - 1.0), 1)
        if "peak_hbm_gib" in a1 and "peak_hbm_gib" in a2:
            verdict["accum_extra_hbm_gib"] = round(
                a2["peak_hbm_gib"] - a1["peak_hbm_gib"], 3)
    if direct.get("status") == "ok" and a2.get("status") == "ok":
        verdict["direct_peak_hbm_gib"] = direct.get("peak_hbm_gib")
        verdict["accum_peak_hbm_gib"] = a2.get("peak_hbm_gib")
        verdict["accum_slowdown_vs_direct_pct"] = round(
            100.0 * (a2["s_per_effective_batch"] / direct["s_per_step"] - 1.0), 1)
    elif direct.get("status") in ("oom", "error", "crashed"):
        verdict["direct_big_batch"] = (
            f"{direct.get('status')} — grad_accum is the single-chip path to "
            f"effective batch {a2.get('effective_batch')}"
        )
    print(json.dumps(verdict))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "verdict": verdict}, f, indent=2)


if __name__ == "__main__":
    main()
