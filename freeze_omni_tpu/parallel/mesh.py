"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.3: CUDA_VISIBLE_DEVICES=0,
no torch.distributed anywhere). The TPU-native design is SPMD from day 1:

- a ('data', 'model') mesh: sessions/batches shard over 'data' (DP), the
  frozen Qwen2-7B backbone shards over 'model' (TP over ICI) — attention heads
  and FFN columns split, XLA inserts all_gather/reduce_scatter;
- the small models (speech encoder, adapter, speech decoder, codec) are
  replicated and ride DP;
- KV caches shard over 'model' on the kv-head axis and 'data' on batch, so
  decode-step collectives stay on ICI.

Works identically on a real TPU slice and on the virtual CPU mesh used in
tests (xla_force_host_platform_device_count).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LLMConfig


def make_mesh(shape: Tuple[int, int] = (1, 1),
              axes: Tuple[str, str] = ("data", "model"),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(shape), axes)


def llm_param_specs(cfg: LLMConfig) -> dict:
    """PartitionSpec tree matching models/qwen2.init_params structure.

    Column-parallel q/k/v/gate/up (output dim on 'model'), row-parallel o/down
    (input dim on 'model'), vocab-parallel embedding + lm_head."""
    layer = {
        "ln1": {"scale": P()},
        "q": {"w": P(None, None, "model"), "b": P(None, "model")},
        "k": {"w": P(None, None, "model"), "b": P(None, "model")},
        "v": {"w": P(None, None, "model"), "b": P(None, "model")},
        "o": {"w": P(None, "model", None)},
        "ln2": {"scale": P()},
        "gate": {"w": P(None, None, "model")},
        "up": {"w": P(None, None, "model")},
        "down": {"w": P(None, "model", None)},
    }
    if not cfg.qkv_bias:
        for k in ("q", "k", "v"):
            layer[k] = {"w": layer[k]["w"]}
    specs = {
        "embed": {"w": P("model", None)},
        "layers": layer,
        "final_norm": {"scale": P()},
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = {"w": P(None, "model")}
    return specs


def kv_cache_specs() -> "P":
    """[L, B, S, Hkv, dk]: batch over 'data', kv heads over 'model'."""
    return P(None, "data", None, "model", None)


def replicated_like(tree) -> dict:
    return jax.tree.map(lambda _: P(), tree)


def batch_specs() -> P:
    return P("data")


def shard_tree(tree, mesh: Mesh, specs):
    """device_put a pytree with NamedShardings built from a spec tree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_llm_params(params: dict, mesh: Mesh, cfg: LLMConfig):
    return shard_tree(params, mesh, llm_param_specs(cfg))
