"""Persistent XLA compilation cache setup.

The engine compiles one kernel per (penalties, s_cap, K, B, L_pad) bucket;
shapes are normalized to powers of two so the set is small, and this cache
makes them survive process restarts (first TPU compile is 20-40s).
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache() -> None:
    """Also honors ALLWAVE_PLATFORM=cpu|axon|tpu to force a backend —
    needed because this environment's sitecustomize force-registers the
    axon TPU plugin and overrides jax_platforms."""
    global _enabled
    if _enabled:
        return
    _enabled = True
    import jax

    platform = os.environ.get("ALLWAVE_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass

    cache_dir = os.environ.get(
        "ALLWAVE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "allwave_tpu", "jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        # cache is best-effort; never fail the run over it
        pass
