"""Deployment serving runtime: a `.mttas` artifact + NIfTI volumes in, masks out.

The closing half of the AOT serving story. `scripts/export_serving.py`
writes the self-contained StableHLO artifact (model + TTA step + initial
state, no model code required at load time); THIS is the loop a deployment
actually runs against it:

    python scripts/serve_artifact.py --artifact unet_tent.mttas \
        --manifest /data/manifest.csv --channels ct pt --out preds/

Per batch it decodes the channel NIfTIs (native fused gunzip+reorient
path), calls the artifact (one jit wrap so the replayed module compiles
once — measured at live-jit parity, BASELINE.md), threads the continual-TTA
state tuple forward, and writes each case's mask back into its source grid
(header-only geometry recovery) plus a `predictions.csv` provenance
manifest in the preprocessing pipeline's error-capture style (reference:
scripts/prepare_hecktor21.py:681-694). Works with both artifact modes:
`adapt` (state-threaded, serves the exported step's uint8 predictions and
its entropy trace — the stream-monitoring signal) and `forward`
(stateless probabilities, thresholded here).

The runtime imports ONLY the data/serving layers — no models/, no flax
model definitions, no optax schedules, no checkpoints. The reference has
no deployment story at all (its serving surface is a live torch eval
loop, reference: src/evaluation/seg_eval.py:239-399).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.utils.host_alloc import retain_host_memory  # noqa: E402
from multimodal_tta_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache  # noqa: E402

apply_platform_env()
enable_compilation_cache()
retain_host_memory()


def _image_spec(meta: dict):
    """(batch, spatial..., channels) of the artifact's image argument."""
    for a in meta.get("args", []):
        if a.get("name") == "image":
            return tuple(int(s) for s in a["shape"])
    raise ValueError("artifact meta has no 'image' argument spec")


def _decode_case(row: dict, channels, expect_dhwc):
    """Stack the case's channel volumes into [D,H,W,C] float32."""
    import numpy as np

    from multimodal_tta_tpu.data.nifti import load_canonical_dhw

    vols = [load_canonical_dhw(row[c]) for c in channels]
    img = np.stack(vols, axis=-1).astype(np.float32)
    if tuple(img.shape) != tuple(expect_dhwc):
        raise ValueError(
            f"case '{row.get('case_id', '?')}' decoded to {img.shape}, "
            f"artifact expects {tuple(expect_dhwc)} — preprocess to the "
            f"exported shape first"
        )
    return img


def _write_manifest(out_dir: str, rows) -> str:
    """(Re)write predictions.csv atomically from the rows so far."""
    manifest_out = os.path.join(out_dir, "predictions.csv")
    if not rows:
        return manifest_out
    keys = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    tmp = manifest_out + ".tmp"
    with open(tmp, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    os.replace(tmp, manifest_out)
    return manifest_out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--artifact", required=True, help=".mttas file (export_serving.py)")
    ap.add_argument("--manifest", required=True,
                    help="CSV with case_id + one path column per channel")
    ap.add_argument("--channels", nargs="+", default=["ct", "pt"],
                    help="manifest column names holding the channel NIfTI "
                         "paths, in the model's channel order")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--regions", nargs="*", default=None,
                    help="region names for the prediction channels "
                         "(default: 'pred' / 'r<i>')")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="probability threshold (forward-mode artifacts "
                         "only; adapt artifacts bake theirs in at export)")
    ap.add_argument("--seed", type=int, default=0, help="serving rng seed")
    ap.add_argument("--limit", type=int, default=None, help="serve first N cases")
    ap.add_argument(
        "--dispatch-deadline", type=float, default=300.0,
        help="seconds a single batch DEVICE dispatch may take before the "
             "serving loop declares the accelerator client wedged and exits "
             "with a diagnosis (0 disables). Host-side decode does not "
             "count (the clock resets after decode); the first batch gets "
             "--first-dispatch-deadline to cover the jit compile",
    )
    ap.add_argument(
        "--first-dispatch-deadline", type=float, default=None,
        help="deadline for the first batch's dispatch (includes one-time "
             "jit compile); default 3x --dispatch-deadline",
    )
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodal_tta_tpu.data.nifti import peek_canonical_geometry, save as nifti_save
    from multimodal_tta_tpu.serving import load_artifact
    from multimodal_tta_tpu.utils.logger import setup_logger

    os.makedirs(args.out, exist_ok=True)
    logger = setup_logger(log_file=os.path.join(args.out, "serve.log"))

    art = load_artifact(args.artifact)
    mode = art.meta.get("mode", "adapt")
    spec = _image_spec(art.meta)
    batch, dhw, n_ch = spec[0], spec[1:-1], spec[-1]
    if n_ch != len(args.channels):
        raise ValueError(
            f"artifact expects {n_ch} channels, --channels names {len(args.channels)}"
        )
    logger.info(
        f"[serve] {args.artifact}: mode={mode}, image={list(spec)}, "
        f"n_state={art.n_state}, platforms={art.meta.get('platforms')}"
    )

    with open(args.manifest, newline="", encoding="utf-8") as f:
        cases = list(csv.DictReader(f))
    if args.limit:
        cases = cases[: args.limit]
    missing = [c for c in args.channels if cases and c not in cases[0]]
    if missing:
        raise ValueError(f"manifest lacks channel columns {missing}")

    call = jax.jit(art.call)  # one compile for the whole stream
    state = [jnp.asarray(s) for s in art.initial_state()]
    rng = jax.random.PRNGKey(args.seed)
    floor = jnp.float32(jnp.nan)

    rows, n_written = [], 0
    # Stalled-dispatch watchdog: a stale/suspended client holding the TPU
    # tunnel makes a dispatch block forever with no exception (the round-3
    # bench failure mode) — deployment loops must diagnose-and-exit, not
    # hang. Progress is any completed batch (utils/watchdog.py).
    from multimodal_tta_tpu.utils.watchdog import DispatchWatchdog

    first_deadline = (
        args.first_dispatch_deadline
        if args.first_dispatch_deadline is not None
        else (args.dispatch_deadline * 3.0 if args.dispatch_deadline else 0.0)
    )
    with DispatchWatchdog(
        args.dispatch_deadline,
        what="serving batch dispatch (serve_artifact)",
        first_deadline_s=first_deadline,
    ) as watchdog:
        for start in range(0, len(cases), batch):
            chunk = cases[start : start + batch]
            n_valid = len(chunk)
            imgs, geoms = [], []
            for row in chunk:
                try:
                    imgs.append(_decode_case(row, args.channels, (*dhw, n_ch)))
                    geoms.append(peek_canonical_geometry(row[args.channels[0]]) + ("ok",))
                except Exception as e:  # error-capture row, keep serving
                    imgs.append(np.zeros((*dhw, n_ch), np.float32))
                    geoms.append((np.eye(4), tuple(reversed(dhw)), f"error:{type(e).__name__}:{e}"))
            while len(imgs) < batch:  # zero-pad the tail batch
                imgs.append(np.zeros((*dhw, n_ch), np.float32))
            # host decode done — reset the watchdog clock so only the device
            # dispatch below counts against the deadline (touch keeps the
            # first batch's compile-sized allowance)
            watchdog.touch()
            image = jnp.asarray(np.stack(imgs))

            if mode == "adapt":
                rng, key = jax.random.split(rng)
                out = call(*state, image, key, jnp.int32(n_valid), floor)
                state = list(out[: art.n_state])
                ents = np.asarray(out[art.n_state])
                pred = np.asarray(out[art.n_state + 1])[:n_valid]
                ent_final = float(ents[-1])
            else:
                prob = np.asarray(call(image))[:n_valid]
                pred = (prob >= args.threshold).astype(np.uint8)
                ent_final = None

            n_regions = pred.shape[-1]
            regions = args.regions or (
                ["pred"] if n_regions == 1 else [f"r{i}" for i in range(n_regions)]
            )
            if len(regions) != n_regions:
                raise ValueError(
                    f"--regions names {len(regions)} channels, prediction has {n_regions}"
                )
            for i, row in enumerate(chunk):
                affine, shape_xyz, status = geoms[i]
                d, h, w = (int(s) for s in dhw)
                if status == "ok" and tuple(shape_xyz) != (w, h, d):
                    status = f"geometry_mismatch:source_xyz={tuple(shape_xyz)}"
                    affine = np.eye(4)
                case_id = row.get("case_id") or row.get("patient_id") or f"case{start + i}"
                out_row = {"case_id": case_id, "status": status}
                if ent_final is not None:
                    out_row["entropy_final"] = round(ent_final, 6)
                pred_xyzr = np.transpose(pred[i], (2, 1, 0, 3)).astype(np.uint8)
                files = []
                for r, name in enumerate(regions):
                    suffix = "pred" if n_regions == 1 else f"{name.lower()}_pred"
                    path = os.path.join(args.out, f"{case_id}_{suffix}.nii.gz")
                    nifti_save(pred_xyzr[..., r], affine, path, dtype=np.uint8)
                    files.append(os.path.basename(path))
                    out_row[f"voxels_{name.lower()}"] = int(pred_xyzr[..., r].sum())
                out_row["files"] = ";".join(files)
                rows.append(out_row)
                n_written += 1
            logger.info(
                f"[serve] batch {start // batch}: {n_valid} cases"
                + (f", entropy {ent_final:.4f}" if ent_final is not None else "")
            )
            watchdog.heartbeat()  # a completed batch is forward progress
            # flush the provenance manifest after EVERY batch: if a later
            # batch wedges the tunnel and the watchdog exits the process,
            # the completed batches' status rows must already be on disk
            # (masks without a manifest are unusable to the operator)
            _write_manifest(args.out, rows)

    logger.info(f"[serve] wrote {n_written} cases -> {args.out}")
    print(json.dumps({"cases": n_written, "out": args.out,
                      "mode": mode, "batch": batch}))
    return rows


if __name__ == "__main__":
    main()
