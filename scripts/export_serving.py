"""AOT serving-artifact export CLI (serving/export.py).

Load a trained checkpoint and write the serving step as a self-contained
StableHLO artifact — the deployment bundle for a runtime with no model
code, flax, optax, or checkpoint machinery (see
multimodal_tta_tpu/serving/export.py for the file format and the serving
loop). The reference has no deployment story (its serving surface is a
live torch eval loop, reference: src/evaluation/seg_eval.py:239-399).

    python scripts/export_serving.py task=hecktor21 dataset=hecktor21 \
        model=unet tta=tent training.resume=outputs/.../best_model \
        +export.path=unet_tent.mttas

Config surface (all optional, ``+export.*`` on the CLI):
  export.mode        adapt | forward (default: adapt when a TTA method is
                     configured, else forward)
  export.path        output file (default <run_dir>/serving.mttas)
  export.batch_size  serving batch (default training.batch_size)
  export.platforms   comma list (default "tpu,cpu")
  export.predict     inline | post (default tta.predict)
  export.verify      smoke-run the artifact on zeros and compare against
                     the live jitted step (default true; runs whenever the
                     current backend is among the artifact's platforms)
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from multimodal_tta_tpu.conf import compose, setup_run_dir
from multimodal_tta_tpu.utils.host_alloc import retain_host_memory
from multimodal_tta_tpu.utils.jax_setup import apply_platform_env
from multimodal_tta_tpu.utils.logger import setup_logger

apply_platform_env()
retain_host_memory()


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(os.path.join(REPO_ROOT, "configs"), "config", argv)

    run_dir = setup_run_dir(cfg)
    logger = setup_logger(log_file=os.path.join(run_dir, "export.log"))

    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodal_tta_tpu.core import ExperimentManager
    from multimodal_tta_tpu.serving import (
        export_adapt_serving,
        export_forward_serving,
        load_artifact,
        save_artifact,
    )
    from multimodal_tta_tpu.tta import TTAEngine
    from multimodal_tta_tpu.utils.config import get_config

    manager = ExperimentManager(cfg)
    manager.setup_model()
    manager.setup_optimizer()

    resume = get_config(cfg, "training.resume", None)
    if not resume:
        raise ValueError("[export] training.resume=<checkpoint> is required")
    from multimodal_tta_tpu.core.checkpoint import load_checkpoint, resolve_serving_params

    state, _ = load_checkpoint(str(resume), manager.state)
    logger.info(f"[export] loaded checkpoint {resume}")
    state = resolve_serving_params(
        state, bool(get_config(cfg, "training.use_ema_params", False))
    )

    # ---- serving shapes from the dataset contract --------------------
    batch = int(get_config(cfg, "export.batch_size",
                           get_config(cfg, "training.batch_size", 8)))
    x, y, z = (int(v) for v in get_config(cfg, "dataset.expected_shape"))
    channels = len(list(get_config(cfg, "dataset.modality_order", ["ct", "pt"])))
    image_shape = (batch, z, y, x, channels)  # loader emits [B,D,H,W,C]

    method = str(get_config(cfg, "tta.method", "none")).lower()
    mode = str(get_config(cfg, "export.mode",
                          "adapt" if method not in ("none", "") else "forward")).lower()
    platforms = tuple(
        p.strip()
        for p in str(get_config(cfg, "export.platforms", "tpu,cpu")).split(",")
        if p.strip()
    )
    path = str(get_config(cfg, "export.path", os.path.join(run_dir, "serving.mttas")))
    thr = float(get_config(cfg, "evaluation.seg.threshold", 0.5))

    # normalization folded into the artifact exactly as the live paths do
    # (builder construction reads config only — no manifest/data required)
    builder = manager.get_dataset_builder_for_task()
    device_transform = None
    if hasattr(builder, "build_transform"):
        device_transform = builder.build_transform("test").device_spec()

    if mode == "adapt":
        engine = TTAEngine(cfg, mesh=None, device_transform=device_transform)
        if engine.adapter is None:
            raise ValueError("[export] export.mode=adapt needs a TTA method (tta=tent)")
        predict_mode = str(get_config(cfg, "export.predict",
                                      get_config(cfg, "tta.predict", "inline")))
        exported, meta, leaves = export_adapt_serving(
            engine.adapter, state, image_shape,
            threshold=thr, predict_mode=predict_mode, platforms=platforms,
        )
        save_artifact(path, exported, meta, leaves)
    elif mode == "forward":
        from multimodal_tta_tpu.evaluation import SegmentationEvaluationStrategy

        strat = SegmentationEvaluationStrategy(cfg)

        def probs(image):
            return strat._probs_fn(state)(image)[1]

        exported, meta = export_forward_serving(probs, image_shape, platforms=platforms)
        save_artifact(path, exported, meta)
    else:
        raise ValueError(f"[export] unknown export.mode: {mode}")

    size_mb = os.path.getsize(path) / 1e6
    logger.info(
        f"[export] wrote {path} ({size_mb:.1f} MB, mode={mode}, "
        f"platforms={list(platforms)}, image={list(image_shape)})"
    )

    # ---- smoke verification -----------------------------------------
    if bool(get_config(cfg, "export.verify", True)):
        backend = jax.default_backend()
        if backend not in platforms:
            logger.info(
                f"[export] verify skipped: current backend '{backend}' is not "
                f"among artifact platforms {list(platforms)}"
            )
            return path
        art = load_artifact(path)
        img = np.zeros(image_shape, np.float32)
        if mode == "forward":
            got = np.asarray(art.call(img))
            want = np.asarray(probs(jnp.asarray(img)))
            ok = np.allclose(got, want, rtol=1e-5, atol=1e-5)
        else:
            rng = np.asarray(jax.random.PRNGKey(0))
            out = art.call(*art.initial_state(), img, rng,
                           np.int32(batch), np.float32(np.nan))
            pred = np.asarray(out[art.n_state + 1])
            ok = pred.shape == image_shape[:4] + (pred.shape[-1],)
        logger.info(f"[export] verify {'OK' if ok else 'FAILED'}")
        if not ok:
            raise RuntimeError("[export] artifact verification failed")
    return path


if __name__ == "__main__":
    main()
