"""Persistent XLA compilation cache for entry points.

First-process compiles of the serving graphs (batched tick, fused first
response, continuation segment, TTS buckets) take minutes on a small host;
the reference pays an analogous torch.compile warmup on every process start
(warmup_compiled_methods, bin/dialog_state_pred.py:846-888). Enabling JAX's
persistent cache makes every restart after the first load compiled programs
from disk instead.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently point JAX's persistent compilation cache at `path`
    (default: $FREEZE_OMNI_CACHE or ~/.cache/freeze_omni_tpu/xla). Call
    before the first jit dispatch. Returns the directory used.

    Also pins the platform from $JAX_PLATFORMS via jax.config: site plugins
    (e.g. the axon TPU plugin) can pre-register a backend and ignore the
    bare env var, so `JAX_PLATFORMS=cpu <entry point>` would silently run
    on the chip without this."""
    import jax

    env_platform = os.environ.get("JAX_PLATFORMS")
    if env_platform:
        jax.config.update("jax_platforms", env_platform)

    path = (path or os.environ.get("FREEZE_OMNI_CACHE")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "freeze_omni_tpu", "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
