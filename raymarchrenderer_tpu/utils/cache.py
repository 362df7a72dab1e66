"""Persistent XLA compilation cache for the product frontends.

The reference recompiles its compute shader on every scene reload
(`Graphics.cpp:741-742`) and eats the cost interactively; our analogue is
the XLA compile of the fused render program — ~20-40s cold on TPU, which
dwarfs the actual render (a 1280x720x128spp frame marches in ~0.5s).  JAX
ships a persistent compilation cache keyed on the lowered HLO; wiring it
into the CLI/viewer means a user pays the compile ONCE per
(shape, schedule) across processes, and every later `render` invocation
at the same shape starts marching immediately.

Opt-out rather than opt-in: the cache is a plain directory of compiled
executables under the user cache dir, safe to delete at any time.

    RAYMARCH_CACHE_DIR=<path>   override the location
    RAYMARCH_NO_CACHE=1         disable entirely (or `--no-cache`)
"""
from __future__ import annotations

import os

DEFAULT_SUBDIR = os.path.join("raymarchrenderer_tpu", "jax-cache")


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME")
    if not base:
        base = os.path.join(os.path.expanduser("~"), ".cache")
    return os.path.join(base, DEFAULT_SUBDIR)


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (created if
    missing).  Returns the cache dir in use, or None when disabled or
    unavailable (old jaxlib, read-only home, ...) — callers never fail
    because of the cache."""
    if os.environ.get("RAYMARCH_NO_CACHE", "0") == "1":
        return None
    path = path or os.environ.get("RAYMARCH_CACHE_DIR") \
        or default_cache_dir()
    try:
        import jax
        from jax.experimental.compilation_cache import (compilation_cache as
                                                        _cc)
        os.makedirs(path, exist_ok=True)
        # config.update alone does NOT re-point a cache backend that a
        # previous compile already initialized — reset it so the new dir
        # actually takes effect mid-process
        changed = jax.config.jax_compilation_cache_dir != path
        _cc.set_cache_dir(path)
        if changed:
            _cc.reset_cache()
        # cache EVERY compile (threshold 0): on remote-attached TPUs even
        # a scalar op's compile is an ~0.4s round trip, and a CLI render
        # issues a dozen of those before the kernel — they are exactly as
        # worth skipping as the big one.  Entries are tiny; override with
        # RAYMARCH_CACHE_MIN_SECS to restore a floor.
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(os.environ.get("RAYMARCH_CACHE_MIN_SECS",
                                               "0")))
    except Exception:
        return None
    return path
