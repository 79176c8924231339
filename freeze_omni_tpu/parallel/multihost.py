"""Multi-host (DCN) tier: distributed init, global meshes, host-local feeding.

The reference is a single-process, single-GPU system (SURVEY.md §2.3 — no
torch.distributed anywhere; scale-out is replica pooling, bin/pool.py:17-91).
The TPU-native scale-out story has two tiers:

- **ICI within a slice** — parallel/mesh.py: TP/DP PartitionSpecs, XLA
  collectives between chips of one host/slice;
- **DCN across hosts** — this module: `jax.distributed` initialization, global
  meshes laid out so the *leading* axis spans hosts (collectives that cross
  hosts ride DCN; everything on trailing axes stays on ICI), and host-local
  batch feeding where each process materializes only its own shard and JAX
  assembles the logical global array.

Everything here also runs multi-process on CPU (gloo collectives + forced
host devices), which is how tests/test_multihost.py exercises real cross-
process collectives without a TPU pod.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(coordinator: str, num_hosts: int, host_id: int) -> None:
    """Join the job's distributed runtime. Call before ANY backend touch
    (device_put, jit dispatch, jax.devices()).

    - Pins the platform from $JAX_PLATFORMS via jax.config first: site
      plugins can pre-register an accelerator backend that ignores the bare
      env var, and with distributed initialized its client creation blocks
      waiting for `num_hosts` participants that will never arrive (observed:
      a tunneled single-chip TPU plugin hanging `jax.devices()` forever).
    - Selects gloo CPU collectives when running on CPU so cross-process
      psum/all_gather work (the CPU default supports only one process).
    """
    import jax

    env_platform = os.environ.get("JAX_PLATFORMS")
    if env_platform:
        jax.config.update("jax_platforms", env_platform)
    if (env_platform or "").split(",")[0] == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_hosts,
                               process_id=host_id)


def maybe_initialize_from_args(coordinator: Optional[str],
                               num_hosts: int,
                               host_id: int) -> bool:
    """CLI glue: initialize iff a coordinator was given (or the FO_COORDINATOR
    / FO_NUM_HOSTS / FO_HOST_ID env triple is set). Returns True when running
    multi-host."""
    coordinator = coordinator or os.environ.get("FO_COORDINATOR")
    if not coordinator:
        return False
    num_hosts = int(os.environ.get("FO_NUM_HOSTS", num_hosts))
    host_id = int(os.environ.get("FO_HOST_ID", host_id))
    if num_hosts < 2:
        raise ValueError("--coordinator given but --num_hosts < 2")
    initialize(coordinator, num_hosts, host_id)
    return True


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def global_devices_host_major() -> list:
    """All devices, ordered (process, local id) so a reshape puts hosts on
    the leading axis — the DCN axis of any mesh built from it."""
    import jax

    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def make_global_mesh(axes: Tuple[str, ...] = ("data",),
                     model_par: int = 1):
    """A global mesh with the host boundary respected.

    1-D ('data',): all devices, hosts outermost — pure DP; gradient psum
    crosses DCN once per step.
    2-D ('data','model'): model_par must divide the per-host device count so
    every TP group lives inside one host/slice (TP collectives are per-layer
    and must stay on ICI); 'data' spans hosts.
    """
    import jax
    from jax.sharding import Mesh

    devs = global_devices_host_major()
    n = len(devs)
    local = len([d for d in devs if d.process_index == devs[0].process_index])
    if len(axes) == 1:
        return Mesh(np.array(devs), axes)
    if len(axes) != 2:
        raise ValueError(f"axes must be 1-D or 2-D, got {axes}")
    if model_par > local or local % model_par != 0:
        raise ValueError(
            f"model_par={model_par} must divide the per-host device count "
            f"{local}: tensor-parallel groups may not straddle hosts (their "
            f"per-layer collectives would ride DCN)")
    return Mesh(np.array(devs).reshape(n // model_par, model_par), axes)


def host_local_to_global(mesh, spec, local_array: np.ndarray):
    """Assemble a logically-global array from this process's shard.

    `local_array` is ONLY this host's rows for sharded specs (every host
    passes its own slice), or the full value for replicated specs (every host
    passes the same thing). No cross-host data movement happens — JAX records
    the shards under one global shape.
    """
    import jax
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_array))


def replicate_global(mesh, tree):
    """Replicate a host-local pytree onto every device of a global mesh.
    Every process must pass the same values (same seed / same checkpoint)."""
    import jax
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(
        lambda x: host_local_to_global(mesh, P(), np.asarray(x)), tree)


def local_batch_slice(batch: dict, num_hosts: int, host_id: int) -> dict:
    """Every host builds the same global batch (same seed/manifest order);
    each keeps only its contiguous row block. Requires the leading dim to be
    divisible by num_hosts."""
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.shape[0] % num_hosts != 0:
            raise ValueError(
                f"batch[{k!r}] leading dim {v.shape[0]} not divisible by "
                f"{num_hosts} hosts")
        per = v.shape[0] // num_hosts
        out[k] = v[host_id * per:(host_id + 1) * per]
    return out


def sync(tag: str = "sync") -> None:
    """Barrier across all processes (DCN round trip)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def shutdown() -> None:
    import jax

    jax.distributed.shutdown()


def tree_checksum(tree) -> float:
    """Order-independent scalar digest of a pytree's values — cheap cross-
    host divergence probe (hosts print it; identical params => identical
    checksums)."""
    import jax

    leaves = [np.asarray(x) for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and np.issubdtype(
                  np.asarray(x).dtype, np.floating)]
    return float(sum(np.abs(l.astype(np.float64)).sum() for l in leaves))
