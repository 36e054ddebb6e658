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

    # Honor JAX_PLATFORMS even when a site hook force-set jax_platforms at
    # interpreter start (some TPU images register remote backends that way);
    # without this, `JAX_PLATFORMS=cpu python train.py ...` silently runs on
    # the remote device.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

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
