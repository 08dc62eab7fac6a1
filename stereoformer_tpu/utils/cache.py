"""Persistent XLA compilation cache.

Cold remote compiles through the axon TPU tunnel cost minutes (the
12-iteration unrolled train step ≈660 s); the persistent cache makes any
previously-compiled program load in seconds in a fresh process.  Verified
to work over the axon PJRT transport (entries are written client-side
around PJRT Compile).

The reference has no analogue — eager PyTorch pays per-op dispatch
instead of compiles (SURVEY §3.1).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".xla_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's compilation cache at a repo-local directory.

    Safe to call multiple times and before/after backend init (the cache
    options are plain config values).  Returns the resolved cache dir.
    """
    import jax

    # SIGUSR1 → stack dump instead of the default terminate: every
    # script that enables the cache becomes safely inspectable while a
    # multi-minute remote compile is in flight (killing a TPU-holding
    # process wedges the axon grant — CLAUDE.md)
    try:
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1)
    except (ImportError, AttributeError, ValueError):
        pass

    path = os.path.abspath(cache_dir or os.environ.get("STEREOFORMER_XLA_CACHE")
                           or DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: even 1-2 s compiles add up through a remote tunnel
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def cache_entries(cache_dir: str | None = None) -> int:
    """Number of compiled programs in the persistent cache (0 if absent)."""
    path = os.path.abspath(cache_dir or os.environ.get("STEREOFORMER_XLA_CACHE")
                           or DEFAULT_CACHE_DIR)
    try:
        return sum(1 for n in os.listdir(path) if n.endswith("-cache"))
    except OSError:
        return 0
