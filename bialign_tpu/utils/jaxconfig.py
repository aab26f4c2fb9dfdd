"""JAX runtime configuration helpers.

The DP engines compile a handful of sizable XLA programs (wavefront scans,
traceback walks).  On backends where compilation is remote or slow, paying
that cost once per process is unacceptable for a CLI tool, so every engine
module enables JAX's persistent compilation cache before its first
compile.  Opt out with ``BIALIGN_TPU_NO_CACHE=1``; override the location
with ``BIALIGN_TPU_CACHE_DIR``.
"""

from __future__ import annotations

import os

_done = False

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "bialign_tpu", "jax"
)


def ensure_compile_cache() -> None:
    """Idempotently enable the persistent JAX compilation cache.

    Also re-applies the ``JAX_PLATFORMS`` environment variable through
    jax.config: a sitecustomize that pre-imports jax (e.g. a TPU plugin
    loader) can pin the platform before user code runs, which would
    silently ignore the env var.
    """
    global _done
    if _done or os.environ.get("BIALIGN_TPU_NO_CACHE"):
        _done = True
        return
    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and jax.config.jax_platforms != env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except RuntimeError:
            pass  # backends already initialized; too late to switch

    if jax.config.jax_compilation_cache_dir is None:
        cache_dir = os.environ.get(
            "BIALIGN_TPU_CACHE_DIR", DEFAULT_CACHE_DIR
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist EVERY executable: on remote-compile backends the
        # round-trip latency (minutes, not counted as compile time) dwarfs
        # any compile-time threshold reasoning, and tiny eager-op programs
        # are exactly the ones dispatched cold by CLI runs.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        try:
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1
            )
        except Exception:
            pass
    _done = True
