"""Stalled-dispatch watchdog for device-facing loops.

Failure mode this defends against (observed, round 3): a *suspended* or
crashed process still holding the TPU client wedges the tunnel, and every
subsequent dispatch from a healthy process blocks forever at its first
device sync — no exception, no timeout, ~0% CPU. A plain ``try/except``
cannot catch this, and a blocked dispatch thread cannot be interrupted from
Python; the only useful responses are (a) detect the stall from a monitor
thread, (b) print an actionable diagnosis, and (c) exit the process (the
wedged thread is unrecoverable anyway).

The reference has no analogue: its torch/CUDA loops fail loudly on device
errors. A tunneled TPU client fails *silently* by blocking, so serving
surfaces here (bench.py, scripts/serve_artifact.py, scripts/sweep_tta.py)
wrap their device dispatches in a :class:`DispatchWatchdog`.

Usage::

    with DispatchWatchdog(60.0, what="adapt+segment dispatch") as wd:
        for batch in stream:
            result = adapt_predict(state, batch)
            wd.heartbeat()          # any forward progress resets the clock

If the protected section makes no heartbeat (and does not exit) within the
deadline, the monitor thread prints :data:`WEDGED_CLIENT_DIAGNOSIS` and
calls ``os._exit(exit_code)``. Pass ``on_timeout`` to override (tests use a
flag-setting callback instead of exiting).
"""

from __future__ import annotations

import os
import sys
import threading
import time

__all__ = ["DispatchWatchdog", "WEDGED_CLIENT_DIAGNOSIS", "wedged_diagnosis"]

WEDGED_CLIENT_DIAGNOSIS = (
    "device produced no result within {deadline:.0f}s ({what}). This is the "
    "signature of a wedged accelerator tunnel: a stale client process "
    "(suspended with SIGTSTP/SIGSTOP, or crashed without releasing the "
    "device) is holding the TPU and every new dispatch blocks forever at "
    "its first sync. Diagnose with `ps aux | awk '$8 ~ /^T/'` (stopped "
    "processes) and look for leftover python clients; resume (`kill -CONT "
    "<pid>`) or terminate (`kill <pid>`) the specific PID, then re-run. "
    "See BASELINE.md 'stale client' notes."
)


def wedged_diagnosis(what: str, deadline: float) -> str:
    return "[watchdog] " + WEDGED_CLIENT_DIAGNOSIS.format(what=what, deadline=deadline)


class DispatchWatchdog:
    """Monitor-thread deadline around potentially-wedging device dispatches.

    Parameters
    ----------
    deadline_s:
        Seconds of no-progress (no ``heartbeat()``, section still open)
        after which the watchdog fires. ``None`` or ``<= 0`` disables it
        (context manager becomes a no-op), so call sites can plumb a config
        knob straight through.
    what:
        Human label for the protected dispatch, used in the diagnosis.
    on_timeout:
        Callback run in the monitor thread when the deadline passes. The
        default prints :func:`wedged_diagnosis` to ``stream`` and calls
        ``os._exit(exit_code)`` — a blocked dispatch thread cannot be
        unblocked, so process exit is the only clean recovery.
    exit_code:
        Exit status for the default ``on_timeout``.
    stream:
        Where the diagnosis is written (default ``sys.stderr``; kept as a
        parameter so benches that must keep stdout machine-parseable can
        route it explicitly).
    first_deadline_s:
        Deadline applied until the first ``heartbeat()`` — the first
        protected section legitimately includes one-time work (jit compile,
        dataset build) that steady-state sections do not, and must not be
        misdiagnosed as a wedge at the steady deadline. Defaults to
        ``deadline_s``.
    """

    def __init__(
        self,
        deadline_s: float | None,
        what: str = "device dispatch",
        on_timeout=None,
        exit_code: int = 3,
        stream=None,
        poll_s: float | None = None,
        first_deadline_s: float | None = None,
    ):
        self.deadline_s = float(deadline_s) if deadline_s else 0.0
        self._current_deadline = (
            float(first_deadline_s) if first_deadline_s else self.deadline_s
        )
        self.what = what
        self.exit_code = exit_code
        self.stream = stream
        self.on_timeout = on_timeout
        self.fired = False
        self._poll_s = poll_s if poll_s is not None else min(1.0, max(0.05, self.deadline_s / 10.0 or 1.0))
        self._done = threading.Event()
        self._last = time.monotonic()
        self._thread: threading.Thread | None = None

    @property
    def enabled(self) -> bool:
        return self.deadline_s > 0

    def heartbeat(self) -> None:
        """Record completed-unit progress; resets the no-progress clock and
        ends the (possibly longer) first-deadline window."""
        self._last = time.monotonic()
        self._current_deadline = self.deadline_s

    def touch(self) -> None:
        """Reset the no-progress clock WITHOUT ending the first-deadline
        window. For host-side progress (NIfTI decode, dataset build) inside
        a protected section: it keeps legitimately slow host work from
        counting against the device-dispatch deadline, while a still-pending
        first device call keeps its compile-sized allowance."""
        self._last = time.monotonic()

    def __enter__(self) -> "DispatchWatchdog":
        if self.enabled:
            self._last = time.monotonic()
            self._thread = threading.Thread(
                target=self._run, name=f"watchdog:{self.what}", daemon=True
            )
            self._thread.start()
        return self

    def __exit__(self, *exc) -> bool:
        self._done.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        return False

    def _run(self) -> None:
        while not self._done.wait(self._poll_s):
            if time.monotonic() - self._last >= self._current_deadline:
                self.fired = True
                self._fire()
                return

    def _fire(self) -> None:
        if self.on_timeout is not None:
            self.on_timeout()
            return
        stream = self.stream if self.stream is not None else sys.stderr
        print(wedged_diagnosis(self.what, self._current_deadline), file=stream, flush=True)
        os._exit(self.exit_code)
