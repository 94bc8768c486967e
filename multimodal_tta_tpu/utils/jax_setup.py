"""Process-level JAX configuration.

XLA compilation in some environments (including this dev image) is remote and
costs tens of seconds to minutes of wall clock per executable; the persistent
compilation cache amortizes that across processes and runs. Env-var
configuration can be pre-empted when jax is imported at interpreter startup
(sitecustomize), so the framework enables the cache programmatically at
ExperimentManager / bench construction.

The cache directory is keyed by a host fingerprint (CPU feature flags + jax
version + platform). XLA:CPU AOT executables are compiled for the *exact*
feature set of the compiling machine; reusing them on a different host is
rejected with "could lead to SIGILL" errors (observed when a shared cache dir
travels across machines). Per-host subdirectories keep the amortization on
any one machine while making cross-machine reuse structurally impossible.
"""

from __future__ import annotations

import hashlib
import os
import platform

_DONE = False
BASE_CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/multimodal_tta_tpu/jax")
)


def host_fingerprint() -> str:
    """Stable id for (machine ISA features, jax version) combinations."""
    parts = [platform.machine(), platform.system()]
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):  # x86 / aarch64
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def apply_platform_env() -> None:
    """Make the documented ``JAX_PLATFORMS`` env var actually work.

    In images where sitecustomize pre-imports jax and pins a platform
    programmatically, the env var a caller sets for a SUBPROCESS (e.g.
    ``JAX_PLATFORMS=cpu python scripts/prepare_hecktor21.py``) is silently
    ignored — the process runs on the pinned accelerator instead (observed:
    an offline "CPU" preprocessing run paying tunnel H2D per volume). Entry
    points call this before first backend use to re-assert the env var via
    ``jax.config``, which wins over the import-time pin."""
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plats)
    except Exception:
        pass  # never fail a run over platform pinning


def enable_compilation_cache(cache_dir: str = None) -> None:
    """Idempotently enable the persistent compilation cache (per-host keyed)."""
    global _DONE
    if _DONE:
        return
    import jax

    base = cache_dir or BASE_CACHE_DIR
    target = os.path.join(base, host_fingerprint())
    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _DONE = True
    except Exception:
        pass  # cache is an optimization; never fail a run over it
