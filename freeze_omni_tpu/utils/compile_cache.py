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


def machine_fingerprint() -> str:
    """Short digest of (jax version, arch, CPU feature flags). The XLA:CPU
    cache stores AOT machine code keyed WITHOUT the host's CPU features: a
    cache directory that outlives the machine (e.g. $HOME carried across VM
    migrations) feeds code compiled for another CPU back to the loader, which
    XLA itself warns "could lead to execution errors such as SIGILL" —
    observed as a hard SIGSEGV mid-serving. Scoping the cache path by this
    fingerprint makes a foreign cache invisible instead of fatal."""
    import hashlib
    import platform

    import jax

    bits = [jax.__version__, platform.machine()]
    try:  # a jaxlib swap under the same jax version must not alias
        import jaxlib

        bits.append(getattr(jaxlib, "__version__", ""))
    except ImportError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(line.split(":", 1)[1].strip())
                    break
    except OSError:
        pass
    return hashlib.sha1(" ".join(bits).encode()).hexdigest()[:12]


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently point JAX's persistent compilation cache at `path`
    (default: $FREEZE_OMNI_CACHE or ~/.cache/freeze_omni_tpu/xla), scoped by
    a machine fingerprint (see machine_fingerprint). Call before the first
    jit dispatch. Returns the directory used.

    Also pins the platform from $JAX_PLATFORMS via jax.config: site plugins
    (e.g. the axon TPU plugin) can pre-register a backend and ignore the
    bare env var, so `JAX_PLATFORMS=cpu <entry point>` would silently run
    on the chip without this."""
    import jax

    env_platform = os.environ.get("JAX_PLATFORMS")
    if env_platform:
        jax.config.update("jax_platforms", env_platform)

    base = (path or os.environ.get("FREEZE_OMNI_CACHE")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "freeze_omni_tpu", "xla"))
    path = os.path.join(base, machine_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
