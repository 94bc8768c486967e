"""Process-level JAX configuration.

XLA compilation in some environments (including this dev image) is remote and
costs tens of seconds to minutes of wall clock per executable; the persistent
compilation cache amortizes that across processes and runs. Env-var
configuration can be pre-empted when jax is imported at interpreter startup
(sitecustomize), so the framework enables the cache programmatically at
ExperimentManager / bench construction.
"""

from __future__ import annotations

import os

_DONE = False
DEFAULT_CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/multimodal_tta_tpu/jax")
)


def enable_compilation_cache(cache_dir: str = None) -> None:
    """Idempotently enable the persistent compilation cache."""
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _DONE = True
    except Exception:
        pass  # cache is an optimization; never fail a run over it
