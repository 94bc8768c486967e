"""Fixture-scale smoke of scripts/bench_model.py (the per-family serving
bench behind BASELINE.md's model tables): for each family it must build the
model, measure both protocols, and emit the expected JSON keys — so a silent
breakage can't corrupt the measurement corpus. Runs on CPU at a tiny
BENCH_SHAPE; the chip numbers are only comparable at the default shape."""

import json
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO_ROOT, "scripts", "bench_model.py")


def _run(model, extra_args=(), timeout=420):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_MODEL=model,
        BENCH_SHAPE="16,32,32,2",
        BENCH_BATCH="1",
    )
    out = subprocess.run(
        [sys.executable, SCRIPT, "--iters", "1", "--warmup", "1", *extra_args],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]


@pytest.mark.parametrize("model", ["unet", "segresnet"])
def test_both_protocols_emit_expected_keys(model):
    rows = _run(model)
    assert [r["protocol"] for r in rows] == ["forward_only", "online_tent"]
    fwd, online = rows
    assert fwd["model"] == online["model"] == model
    assert fwd["ms_per_batch"] > 0
    for r in rows:
        assert r["volumes_per_sec_per_chip"] > 0
        assert r["batch"] == 1


def test_bench_gate_refuses_conflicting_env_knobs():
    """bench_gate measures the headline tent config through TWO paths (the
    fused adapt fn from bench.py and a hand-built twin adapter for the gate
    fast path); bench.py env knobs would de-synchronize them silently, so
    the script must refuse to run with any set."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(JAX_PLATFORMS="cpu", BENCH_TTA_METHOD="cotta")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "scripts", "bench_gate.py")],
        env=env, capture_output=True, text=True, timeout=180, cwd=REPO_ROOT,
    )
    assert out.returncode != 0
    assert "BENCH_TTA_METHOD" in out.stderr and "headline" in out.stderr


def test_transformer_family_forward_row():
    # online-Tent through the ViT backward is too slow for a CPU smoke;
    # the forward row proves construction + measurement for the family
    rows = _run("unetr", extra_args=("--skip-online",))
    assert len(rows) == 1 and rows[0]["protocol"] == "forward_only"
    assert rows[0]["model"] == "unetr"
    assert rows[0]["volumes_per_sec_per_chip"] > 0
