"""Test harness: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (one real TPU); tests must not grab the
chip, and multi-chip sharding logic is validated on CPU-backed devices."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
