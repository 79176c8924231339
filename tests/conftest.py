"""Test harness: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (one real TPU); tests must not grab the
chip, and multi-chip sharding logic is validated on CPU-backed devices."""

import os

# opt level 0: test shapes are tiny, so XLA compile time dominates the suite
# on this box's single CPU core; measured ~25-30% faster with no behavioral
# difference (numerical parity tests all still pass).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_backend_optimization_level=0"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: the suite is compile-dominated on this
# box's single CPU core, and the cache works for the forced-host backend too
# (measured 11.5s -> 1.4s on a probe program). First run pays the compiles;
# repeat runs of unchanged tests skip them.
# (fingerprint-scoped: a cache dir carried across machines must never feed
# foreign-CPU AOT code back to XLA — observed SIGSEGV; utils/compile_cache.py)
from freeze_omni_tpu.utils.compile_cache import machine_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache",
                 machine_fingerprint()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
