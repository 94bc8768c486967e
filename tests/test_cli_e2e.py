"""CLI end-to-end tests: main.py train, adapt.py TTA, sweep_tta.py."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

from fixtures import make_hecktor_fixture

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, overrides, timeout=1800):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
    return subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, script)] + overrides,
        capture_output=True,
        text=True,
        env=env,
        timeout=timeout,
        cwd=REPO_ROOT,
    )


@pytest.fixture(scope="module")
def fixture_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    manifest = make_hecktor_fixture(
        str(root / "data"), shape=(16, 16, 16), centers={"CHUS": 3, "CHUM": 3, "CHGJ": 3}
    )
    return {"manifest": manifest, "root": str(root)}


def common_overrides(fx, run_name):
    return [
        f"dataset.manifest_csv={fx['manifest']}",
        "dataset.expected_shape=[16,16,16]",
        "dataset.val_per_center=1",
        "training.epochs=1",
        "training.batch_size=2",
        "training.eval_batch_size=2",
        "training.num_workers=0",
        "training.compute_dtype=float32",
        "training.data.transforms.image_size=[16,16,16]",
        "training.model_save_start=1",
        "training.model_save_freq=1",
        "model.channels=[2,4,8,16,32]",
        "model.num_res_units=1",
        f"task.save_dir={fx['root']}/outputs",
        f"task.run_name={run_name}",
    ]


class TestMainCLI:
    def test_train_run(self, fixture_env):
        proc = run_cli("main.py", common_overrides(fixture_env, "cli_train"))
        assert proc.returncode == 0, proc.stderr[-3000:]
        # run dir with log + checkpoints exists
        base = os.path.join(fixture_env["root"], "outputs", "cli_train")
        runs = os.listdir(base)
        assert runs
        run_dir = os.path.join(base, sorted(runs)[-1])
        assert os.path.exists(os.path.join(run_dir, "train.log"))
        ckpts = os.listdir(os.path.join(run_dir, "checkpoints"))
        assert any(c.endswith(".msgpack") for c in ckpts)


class TestAdaptCLI:
    def test_tta_run(self, fixture_env):
        proc = run_cli(
            "adapt.py",
            common_overrides(fixture_env, "cli_tta")
            + ["tta=tent", "tta.steps=1", "tta.report_no_adapt=true"],
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        base = os.path.join(fixture_env["root"], "outputs", "cli_tta")
        run_dir = os.path.join(base, sorted(os.listdir(base))[-1])
        with open(os.path.join(run_dir, "tta_metrics.json")) as f:
            metrics = json.load(f)
        assert "adapted" in metrics and "no_adapt" in metrics
        assert "gtvt_dc" in metrics["adapted"]
        assert "dom/CHUS/avg_dc" in metrics["adapted"]


class TestScopedAdaptCLI:
    def test_scoped_tta_run(self, fixture_env):
        """Layer-scoped Tent through the user-facing CLI: the
        tta.update_path_regex override reaches the adapter (run log records
        the path filter) and the run produces the same metrics schema."""
        proc = run_cli(
            "adapt.py",
            common_overrides(fixture_env, "cli_tta_scoped")
            + ["tta=tent", "tta.steps=1",
               "tta.update_path_regex=^(dec0|up0)"],
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        base = os.path.join(fixture_env["root"], "outputs", "cli_tta_scoped")
        run_dir = os.path.join(base, sorted(os.listdir(base))[-1])
        with open(os.path.join(run_dir, "tta_metrics.json")) as f:
            metrics = json.load(f)
        assert "gtvt_dc" in metrics["adapted"]
        # the scope actually bit: the adapter logged the path filter
        log = proc.stderr + proc.stdout
        assert "under path filter" in log and "dec0|up0" in log


class TestPredictCLI:
    def test_predict_export_run(self, fixture_env):
        """predict.py writes per-case NIfTI masks + predictions.csv for the
        test split, with TTA on (continual tent, predictions exported from
        the adapted state)."""
        proc = run_cli(
            "predict.py",
            common_overrides(fixture_env, "cli_predict")
            + ["tta=tent", "tta.steps=1", "tta.episodic=false", "predict.save_prob=true"],
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        base = os.path.join(fixture_env["root"], "outputs", "cli_predict")
        run_dir = os.path.join(base, sorted(os.listdir(base))[-1])
        out_dir = os.path.join(run_dir, "predictions")
        df = pd.read_csv(os.path.join(out_dir, "predictions.csv"))
        # fixture: CHUS is the default target center -> its 3 cases are test
        assert len(df) == 3
        assert set(df["status"]) == {"ok"}
        assert "voxels_gtvt" in df.columns
        for _, row in df.iterrows():
            for f in str(row["files"]).split(";"):
                assert os.path.exists(os.path.join(out_dir, f))
            assert os.path.exists(os.path.join(out_dir, str(row["prob_file"])))


class TestSweepCLI:
    def test_sweep(self, fixture_env):
        proc = run_cli(
            "scripts/sweep_tta.py",
            common_overrides(fixture_env, "cli_sweep")
            + ["tta=tent", "tta.steps=1", 'sweep.centers=["CHUS","CHUM"]'],
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        base = os.path.join(fixture_env["root"], "outputs", "cli_sweep")
        run_dir = os.path.join(base, sorted(os.listdir(base))[-1])
        with open(os.path.join(run_dir, "sweep_metrics.json")) as f:
            summary = json.load(f)
        assert set(summary["centers"].keys()) == {"CHUS", "CHUM"}
        assert summary["total_cases"] == 6
        assert summary["cases_per_second"] > 0


class TestStreamAdaptCLI:
    def test_streaming_tta_run(self, fixture_env):
        """adapt.py with tta.stream.enabled runs the ordered-domain
        streaming protocol (BASELINE config #5) through the CLI: per-domain
        Dice keys, positions trace, reanchor count."""
        proc = run_cli(
            "adapt.py",
            common_overrides(fixture_env, "cli_stream")
            + [
                "tta=tent",
                "tta.steps=1",
                "tta.episodic=false",
                "tta.stream.enabled=true",
                "tta.stream.policy=reset_on_domain_change",
                "tta.stream.guard=true",
                "tta.stream.domain_order=[CHUS,CHUM]",
            ],
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        base = os.path.join(fixture_env["root"], "outputs", "cli_stream")
        run_dir = os.path.join(base, sorted(os.listdir(base))[-1])
        with open(os.path.join(run_dir, "tta_metrics.json")) as f:
            metrics = json.load(f)
        adapted = metrics["adapted"]
        assert adapted["policy"] == "reset_on_domain_change+guard"
        assert "dom/CHUS/avg_dc" in adapted and "dom/CHUM/avg_dc" in adapted
        assert adapted["positions"] and adapted["positions"][0]["domain"] == "CHUS"
        assert adapted["reanchors"] >= 1  # the CHUS -> CHUM boundary

    def test_defense_presets_run(self, fixture_env):
        """The CoTTA-restore / EATA-gate knobs plumb through the CLI: one
        adapt.py run with both enabled (the configs/tta presets package the
        same keys) still produces the full metric schema."""
        proc = run_cli(
            "adapt.py",
            common_overrides(fixture_env, "cli_defense")
            + [
                "tta=cotta_restore",
                "tta.steps=1",
                "tta.restore.prob=0.5",
                "tta.reliability.enabled=true",
                "tta.reliability.margin_ratio=10.0",
            ],
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        base = os.path.join(fixture_env["root"], "outputs", "cli_defense")
        run_dir = os.path.join(base, sorted(os.listdir(base))[-1])
        with open(os.path.join(run_dir, "tta_metrics.json")) as f:
            metrics = json.load(f)
        assert "gtvt_dc" in metrics["adapted"]

    def test_cotta_method_runs(self, fixture_env):
        """tta=cotta drives the EMA-teacher adapter through the full CLI:
        registry dispatch, engine, metric schema."""
        proc = run_cli(
            "adapt.py",
            common_overrides(fixture_env, "cli_cotta")
            + ["tta=cotta", "tta.steps=1", "tta.n_views=1"],
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        base = os.path.join(fixture_env["root"], "outputs", "cli_cotta")
        run_dir = os.path.join(base, sorted(os.listdir(base))[-1])
        with open(os.path.join(run_dir, "tta_metrics.json")) as f:
            metrics = json.load(f)
        assert "gtvt_dc" in metrics["adapted"]
