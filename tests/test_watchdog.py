"""Stalled-dispatch watchdog + bench hang-proofing.

Round-3 postmortem: a stale suspended TPU client wedged the tunnel and the
driver's bench run produced rc=124 with an empty artifact (VERDICT round 3,
missing #1). These tests pin the three defenses:

  1. `DispatchWatchdog` unit behavior (fires on a mock-hung callable,
     heartbeats reset it, clean exit disarms it, deadline<=0 disables it);
  2. bench.py's liveness preflight exits nonzero FAST with the
     wedged-client diagnosis when the device never answers (simulated);
  3. a wedge in any optional config after the headline line leaves a
     parseable artifact on stdout and exit code 0 (simulated).
"""

import json
import os
import subprocess
import sys
import threading
import time

import pytest

from multimodal_tta_tpu.utils.watchdog import DispatchWatchdog, wedged_diagnosis

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestDispatchWatchdog:
    def test_fires_on_hung_callable(self):
        fired = threading.Event()
        with DispatchWatchdog(0.15, what="mock hang", on_timeout=fired.set, poll_s=0.02):
            # a "dispatch" that produces no result within the deadline
            fired.wait(timeout=5.0)
        assert fired.is_set()

    def test_heartbeat_resets_deadline(self):
        fired = threading.Event()
        with DispatchWatchdog(0.3, what="hb", on_timeout=fired.set, poll_s=0.02) as wd:
            for _ in range(5):
                time.sleep(0.1)
                wd.heartbeat()  # progress: total 0.5s > deadline, never idle > 0.3s
        assert not fired.is_set()

    def test_clean_exit_disarms(self):
        fired = threading.Event()
        with DispatchWatchdog(0.2, what="fast", on_timeout=fired.set, poll_s=0.02):
            pass
        time.sleep(0.4)
        assert not fired.is_set()

    @pytest.mark.parametrize("deadline", [None, 0, -1.0])
    def test_disabled(self, deadline):
        fired = threading.Event()
        with DispatchWatchdog(deadline, on_timeout=fired.set) as wd:
            assert not wd.enabled
            time.sleep(0.1)
        assert not fired.is_set()

    def test_exception_propagates_and_disarms(self):
        fired = threading.Event()
        with pytest.raises(RuntimeError):
            with DispatchWatchdog(0.2, on_timeout=fired.set, poll_s=0.02):
                raise RuntimeError("boom")
        time.sleep(0.4)
        assert not fired.is_set()

    def test_diagnosis_names_the_failure(self):
        msg = wedged_diagnosis("adapt dispatch", 60.0)
        assert "adapt dispatch" in msg
        assert "stale" in msg and "kill" in msg.lower()


def _bench_env(**extra):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no need for 8 virtual devices in the child
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_E2E="0",
        BENCH_SCOPED="1",
        BENCH_WS="0",
    )
    env.update({k: str(v) for k, v in extra.items()})
    return env


class TestBenchHangProofing:
    def test_preflight_hang_exits_nonzero_with_diagnosis(self):
        """Simulated wedge BEFORE any measurement: bench must exit fast and
        nonzero with the actionable diagnosis — never rc=124/empty stdout."""
        t0 = time.monotonic()
        out = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "bench.py")],
            env=_bench_env(BENCH_SIMULATE_HANG="preflight", BENCH_PREFLIGHT_DEADLINE="1"),
            capture_output=True,
            text=True,
            timeout=120,
            cwd=REPO_ROOT,
        )
        elapsed = time.monotonic() - t0
        assert out.returncode == 3, (out.returncode, out.stderr[-2000:])
        assert "wedged" in out.stderr or "stale" in out.stderr, out.stderr[-2000:]
        assert "liveness preflight" in out.stderr
        # "fast": well inside any driver timeout (bulk of this is interpreter
        # + jax import, not the 1s watchdog)
        assert elapsed < 110

    def test_extras_hang_preserves_headline_artifact(self):
        """Simulated wedge in an optional config AFTER the headline line:
        bench must exit 0 with a parseable JSON artifact on stdout."""
        # stub the measurement fns so the CPU child is fast; the hang is
        # injected by BENCH_SIMULATE_HANG=extras inside the scoped config
        driver = (
            "import bench\n"
            "bench.measure_device = lambda **kw: 42.0\n"
            "bench.cpu_baseline = lambda w='strict': None\n"
            "bench.main()\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", driver],
            env=_bench_env(BENCH_SIMULATE_HANG="extras", BENCH_CONFIG_BUDGET="1"),
            capture_output=True,
            text=True,
            timeout=420,
            cwd=REPO_ROOT,
        )
        assert out.returncode == 0, (out.returncode, out.stderr[-2000:])
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        assert lines, out.stdout
        artifact = json.loads(lines[-1])
        assert artifact["value"] == 42.0
        assert artifact["unit"] == "volumes/sec/chip"
        assert "scoped-tent config" in out.stderr and "wedged" in out.stderr
        assert "headline JSON already emitted" in out.stderr

    def test_normal_cpu_stub_run_emits_extended_line_last(self):
        """No hang: the LAST stdout line is the extended artifact (superset
        of the headline), so the driver's last-line parse gets extras."""
        driver = (
            "import bench\n"
            "bench.measure_device = lambda **kw: 42.0\n"
            "bench.cpu_baseline = lambda w='strict': None\n"
            "bench.main()\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", driver],
            env=_bench_env(BENCH_CONFIG_BUDGET="60"),
            capture_output=True,
            text=True,
            timeout=420,
            cwd=REPO_ROOT,
        )
        assert out.returncode == 0, (out.returncode, out.stderr[-2000:])
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        assert len(lines) == 2  # headline immediately, extended at the end
        head, ext = json.loads(lines[0]), json.loads(lines[1])
        assert head["value"] == ext["value"] == 42.0
        assert "tail_scoped_online_volumes_per_sec_per_chip" in ext
        assert "tail_scoped_online_volumes_per_sec_per_chip" not in head
