"""Deployment serving runtime (scripts/serve_artifact.py): artifact + NIfTI
volumes in, masks + provenance manifest out, continual state threaded across
batches — with no model code or checkpoints in the loop."""

import csv
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tta_tpu.data import nifti
from multimodal_tta_tpu.serving import (
    export_adapt_serving,
    export_forward_serving,
    save_artifact,
)
from multimodal_tta_tpu.tta.tent import TentAdapter

from test_serving_export import SHAPE, tent_cfg, tiny_state

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli():
    path = os.path.join(REPO_ROOT, "scripts", "serve_artifact.py")
    spec = importlib.util.spec_from_file_location("serve_artifact", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["serve_artifact"] = mod
    spec.loader.exec_module(mod)
    return mod


def make_cases(root, n=3, missing_idx=None):
    """n single-channel NIfTI cases at the artifact's spatial shape, plus a
    manifest CSV; ``missing_idx`` points one row at a nonexistent file."""
    os.makedirs(root, exist_ok=True)
    d, h, w = SHAPE[1:4]
    rng = np.random.RandomState(3)
    rows = []
    for i in range(n):
        path = os.path.join(root, f"case{i}_ct.nii.gz")
        vol_xyz = rng.randn(w, h, d).astype(np.float32)
        nifti.save(vol_xyz, np.eye(4), path, dtype=np.float32)
        if missing_idx == i:
            path = os.path.join(root, "does_not_exist.nii.gz")
        rows.append({"case_id": f"case{i}", "ct": path})
    manifest = os.path.join(root, "manifest.csv")
    with open(manifest, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=["case_id", "ct"])
        wtr.writeheader()
        wtr.writerows(rows)
    return manifest, rows


class TestServeArtifactCLI:
    def test_adapt_artifact_stream_matches_live_loop(self, tmp_path):
        state, _ = tiny_state()
        c = tent_cfg()
        adapter = TentAdapter(c.tta, config=c, mesh=None)
        exported, meta, leaves0 = export_adapt_serving(
            adapter, state, SHAPE, threshold=0.5, platforms=("cpu",)
        )
        art_path = os.path.join(tmp_path, "tent.mttas")
        save_artifact(art_path, exported, meta, leaves0)

        manifest, rows = make_cases(os.path.join(tmp_path, "data"), n=3)
        out_dir = os.path.join(tmp_path, "preds")
        cli = _load_cli()
        out_rows = cli.main([
            "--artifact", art_path, "--manifest", manifest,
            "--channels", "ct", "--out", out_dir, "--seed", "0",
        ])
        assert len(out_rows) == 3
        assert all(r["status"] == "ok" for r in out_rows)
        assert all("entropy_final" in r for r in out_rows)
        assert os.path.exists(os.path.join(out_dir, "predictions.csv"))

        # live replay with the SAME key schedule and state threading: the
        # runtime's written masks must match the adapter's serving spec
        call, st = adapter.serving_export_spec(state, 0.5, "inline")
        rng = jax.random.PRNGKey(0)
        for i, row in enumerate(rows):
            img = nifti.load_canonical_dhw(row["ct"])[None, ..., None]
            rng, key = jax.random.split(rng)
            st, _, pred = call(st, jnp.asarray(img), key, jnp.int32(1),
                               jnp.float32(jnp.nan))
            written = nifti.load_canonical_dhw(
                os.path.join(out_dir, f"case{i}_pred.nii.gz")
            )
            np.testing.assert_array_equal(
                written.astype(np.uint8), np.asarray(pred)[0, ..., 0]
            )

    def test_forward_artifact_and_error_capture(self, tmp_path):
        state, _ = tiny_state()

        def probs(image):
            return jax.nn.sigmoid(
                state.apply_fn({"params": state.params}, image, train=False)
            )

        exported, meta = export_forward_serving(probs, SHAPE, platforms=("cpu",))
        art_path = os.path.join(tmp_path, "fwd.mttas")
        save_artifact(art_path, exported, meta)

        manifest, _ = make_cases(os.path.join(tmp_path, "data"), n=3, missing_idx=1)
        out_dir = os.path.join(tmp_path, "preds")
        cli = _load_cli()
        out_rows = cli.main([
            "--artifact", art_path, "--manifest", manifest,
            "--channels", "ct", "--out", out_dir, "--threshold", "0.5",
        ])
        assert len(out_rows) == 3
        statuses = [r["status"] for r in out_rows]
        assert statuses[0] == "ok" and statuses[2] == "ok"
        assert statuses[1].startswith("error:")  # captured, stream continued
        assert "entropy_final" not in out_rows[0]  # forward mode: stateless

    def test_stalled_dispatch_watchdog_fires(self, tmp_path, monkeypatch):
        """A batch that produces no result within --dispatch-deadline must
        trip the wedged-client watchdog (round-3 failure mode: a stale
        suspended client wedges the tunnel and the dispatch blocks forever
        with no exception). The stall is simulated with a slow decode; the
        firing path is recorded instead of os._exit-ing the test runner."""
        import time

        from multimodal_tta_tpu.utils import watchdog as watchdog_mod

        state, _ = tiny_state()

        def probs(image):
            return jax.nn.sigmoid(
                state.apply_fn({"params": state.params}, image, train=False)
            )

        exported, meta = export_forward_serving(probs, SHAPE, platforms=("cpu",))
        art_path = os.path.join(tmp_path, "fwd.mttas")
        save_artifact(art_path, exported, meta)
        manifest, _ = make_cases(os.path.join(tmp_path, "data"), n=1)

        fired = {}
        real_watchdog = watchdog_mod.DispatchWatchdog

        class Recorder(real_watchdog):
            def _fire(self):  # keep the diagnosis, skip the os._exit
                fired["msg"] = watchdog_mod.wedged_diagnosis(
                    self.what, self.deadline_s
                )

        monkeypatch.setattr(watchdog_mod, "DispatchWatchdog", Recorder)

        cli = _load_cli()
        real_decode = cli._decode_case

        def wedged_decode(*a, **kw):
            time.sleep(1.2)  # "hung" longer than the deadline, then recovers
            return real_decode(*a, **kw)

        monkeypatch.setattr(cli, "_decode_case", wedged_decode)
        out_rows = cli.main([
            "--artifact", art_path, "--manifest", manifest,
            "--channels", "ct", "--out", os.path.join(tmp_path, "preds"),
            "--dispatch-deadline", "0.3",
        ])
        assert fired, "watchdog did not fire on a stalled batch"
        assert "wedged" in fired["msg"] and "stale" in fired["msg"]
        assert len(out_rows) == 1  # the recorder lets the stream finish

    def test_dispatch_deadline_zero_disables_watchdog(self, tmp_path):
        state, _ = tiny_state()

        def probs(image):
            return jax.nn.sigmoid(
                state.apply_fn({"params": state.params}, image, train=False)
            )

        exported, meta = export_forward_serving(probs, SHAPE, platforms=("cpu",))
        art_path = os.path.join(tmp_path, "fwd.mttas")
        save_artifact(art_path, exported, meta)
        manifest, _ = make_cases(os.path.join(tmp_path, "data"), n=1)
        cli = _load_cli()
        out_rows = cli.main([
            "--artifact", art_path, "--manifest", manifest,
            "--channels", "ct", "--out", os.path.join(tmp_path, "preds"),
            "--dispatch-deadline", "0",
        ])
        assert len(out_rows) == 1

    def test_channel_count_mismatch_fails_loudly(self, tmp_path):
        state, _ = tiny_state()
        c = tent_cfg()
        adapter = TentAdapter(c.tta, config=c, mesh=None)
        exported, meta, leaves0 = export_adapt_serving(
            adapter, state, SHAPE, threshold=0.5, platforms=("cpu",)
        )
        art_path = os.path.join(tmp_path, "tent.mttas")
        save_artifact(art_path, exported, meta, leaves0)
        manifest, _ = make_cases(os.path.join(tmp_path, "data"), n=1)
        cli = _load_cli()
        with pytest.raises(ValueError, match="channels"):
            cli.main([
                "--artifact", art_path, "--manifest", manifest,
                "--channels", "ct", "pt", "--out", os.path.join(tmp_path, "p"),
            ])
