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


def _linear_spec(kind: str, lead: int, p: Optional[dict] = None) -> dict:
    """Spec for one projection. kind='col' shards the output axis on 'model',
    'row' shards the input axis. lead=1 for stacked-layer weights ([L, ...]).
    Matches bf16 {"w"}, int8 weight-only {"w_q","scale"} and grouped int4
    {"w_q4","scale4"} trees (ops/quant.py layouts); `p` selects which keys to
    emit (bf16 w (+bias) when None)."""
    pre = (None,) * lead
    col = kind == "col"
    w_spec = P(*pre, None, "model") if col else P(*pre, "model", None)
    keys = set(p.keys()) if p is not None else {"w"}
    out = {}
    if "w" in keys:
        out["w"] = w_spec
    if "w_q" in keys:  # int8 [*, in, out]
        out["w_q"] = w_spec
    if "scale" in keys:  # int8 per-output-channel [*, out]
        out["scale"] = P(*pre, "model") if col else P(*pre, None)
    if "w_q4" in keys:  # int4 packed [*, in/2, out] — input still axis -2
        out["w_q4"] = w_spec
    if "scale4" in keys:  # [*, in/group, out]
        out["scale4"] = P(*pre, None, "model") if col else P(*pre, "model", None)
    if "b" in keys:  # bias rides the output axis
        out["b"] = P(*pre, "model") if col else P(*pre, None)
    return out


def llm_param_specs(cfg: LLMConfig, params: Optional[dict] = None) -> dict:
    """PartitionSpec tree matching models/qwen2.init_params structure —
    bf16 or weight-only-quantized (pass `params` to match the actual tree).

    Column-parallel q/k/v/gate/up (output dim on 'model'), row-parallel o/down
    (input dim on 'model'), vocab-parallel embedding + lm_head."""
    lp = params["layers"] if params is not None else None

    def proj(name, kind):
        if lp is not None:
            return _linear_spec(kind, 1, lp[name])
        if cfg.qkv_bias and name in ("q", "k", "v"):
            return {"w": _linear_spec(kind, 1)["w"],
                    "b": P(None, "model") if kind == "col" else P(None, None)}
        return _linear_spec(kind, 1)

    layer = {
        "ln1": {"scale": P()},
        "q": proj("q", "col"),
        "k": proj("k", "col"),
        "v": proj("v", "col"),
        "o": proj("o", "row"),
        "ln2": {"scale": P()},
        "gate": proj("gate", "col"),
        "up": proj("up", "col"),
        "down": proj("down", "row"),
    }
    embed = {"w": P("model", None)}
    if params is not None and "w_q" in params["embed"]:
        # quantize_embedding: {"w_q": int8 [V, D], "scale": f32 [V]}
        embed = {"w_q": P("model", None), "scale": P("model")}
    specs = {
        "embed": embed,
        "layers": layer,
        "final_norm": {"scale": P()},
    }
    has_head = (params is not None and "lm_head" in params) or \
        (params is None and not cfg.tie_embeddings)
    if has_head:
        hp = params.get("lm_head") if params is not None else None
        specs["lm_head"] = _linear_spec("col", 0, hp)
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
    return shard_tree(params, mesh, llm_param_specs(cfg, params))
