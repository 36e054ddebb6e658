"""JAX runtime setup shared by all entry points."""
from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache.

    XLA compiles of the fused train step take minutes on remote-compile TPU
    backends; the on-disk cache turns every subsequent process start into a
    fast cache hit.  Idempotent; respects an existing user setting.
    """
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.dirname(os.path.dirname(
                     os.path.dirname(os.path.abspath(__file__)))),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
