"""Persistent XLA compilation cache.

Wavefront programs compile in seconds on CPU but can take *minutes*
through remote-compile TPU toolchains; the persistent cache makes every
shape a one-time cost per machine.  Called by the CLI, the bench
harness, and the driver entry points.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Priority: explicit arg > $JAX_COMPILATION_CACHE_DIR > repo-local
    ``.jax_cache``.  Returns the directory used.
    """
    import jax

    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
