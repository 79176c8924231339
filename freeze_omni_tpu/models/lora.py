"""LoRA adapters for the frozen Qwen2 backbone — the working version of the
reference's dead code.

The reference carries a LoRA block that cannot run: models/audioLLM.py:150-157
gates `self.use_lora` over names that are never defined (flagged in SURVEY.md
§7 as a bug not to replicate). This module supplies the capability that block
gestured at, TPU-native:

- `init`: low-rank (A, B) pairs per decoder-layer projection, stored stacked
  [L, ...] like the backbone itself so `qwen2.forward`'s layer scan carries
  them with zero restructuring. B starts at zero, so an untrained adapter is
  an exact no-op.
- `qwen2.forward(..., lora=...)` applies the deltas in-scan (frozen weights
  untouched — the Freeze-Omni premise is that the LLM never changes, LoRA is
  the one sanctioned escape hatch because the base weights stay frozen).
- `merge`: folds scale * A @ B into the dense weights for zero-overhead
  serving. Works on bf16/f32 trees AND quantized trees (int8 per-channel /
  int4 grouped): dequantize -> add delta -> requantize with fresh scales.

Training integration: stage "lora" in training/train_step.py (next-token CE
with only the adapter trainable).
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..config import LLMConfig

# projections a LoRA pair may attach to (the stacked-linear names of
# qwen2.init_layer_stack)
TARGETS = ("q", "k", "v", "o", "gate", "up", "down")
DEFAULT_TARGETS = ("q", "v")


def _dims(cfg: LLMConfig, name: str) -> tuple:
    D, H, Hkv, dk = cfg.hidden, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    return {
        "q": (D, H * dk),
        "k": (D, Hkv * dk),
        "v": (D, Hkv * dk),
        "o": (H * dk, D),
        "gate": (D, cfg.ffn),
        "up": (D, cfg.ffn),
        "down": (cfg.ffn, D),
    }[name]


def init(key, cfg: LLMConfig, rank: int = 8,
         targets: Sequence[str] = DEFAULT_TARGETS,
         dtype=jnp.float32) -> Dict[str, dict]:
    """{name: {"a": [L, in, r], "b": [L, r, out]}} for each target projection.

    A ~ U(-1/sqrt(in), 1/sqrt(in)) (kaiming-uniform fan-in, like the base
    linears), B = 0 — the standard LoRA init: the delta starts exactly zero,
    so attaching an untrained adapter does not perturb the model."""
    unknown = set(targets) - set(TARGETS)
    if unknown:
        raise ValueError(f"unknown LoRA targets {sorted(unknown)} "
                         f"(expected among {TARGETS})")
    L = cfg.num_layers
    tree = {}
    for i, name in enumerate(targets):
        d_in, d_out = _dims(cfg, name)
        bound = 1.0 / math.sqrt(d_in)
        ka = jax.random.fold_in(key, i)
        tree[name] = {
            "a": jax.random.uniform(ka, (L, d_in, rank), dtype, -bound, bound),
            "b": jnp.zeros((L, rank, d_out), dtype),
        }
    return tree


def delta(lora_l: dict, h: jnp.ndarray, scale: float) -> jnp.ndarray:
    """One layer's delta: scale * (h @ A) @ B, computed in the adapter dtype
    (f32 while training over a bf16 backbone), returned in h's dtype so the
    residual-stream carry dtype is unchanged."""
    a, b = lora_l["a"], lora_l["b"]
    y = (h.astype(a.dtype) @ a) @ b
    return (jnp.asarray(scale, a.dtype) * y).astype(h.dtype)


def merge(llm_params: dict, lora: Dict[str, dict], scale: float = 1.0) -> dict:
    """Fold the adapter into the backbone weights; returns a NEW llm tree
    (inputs unmodified). Dense leaves gain the delta in their own dtype;
    quantized leaves (int8 {"w_q","scale"} / int4 {"w_q4","scale4"}) are
    dequantized, merged in f32, and requantized with fresh scales — so a
    convert-then-quantize serving checkpoint can still take an adapter.

    Runs layer-by-layer (lax.map over the stacked L axis) so the f32
    transient is ONE layer's [in, out] (~270 MB for 7B ffn projections), not
    the full [L, in, out] stack (~7.6 GiB, which OOMed the 16 GB chip the
    quantized serving path exists for — ADVICE r3)."""
    from ..ops import quant

    layers = dict(llm_params["layers"])
    for name, pair in lora.items():
        p = layers[name]
        weight_keys = [k for k in p if k != "b"]

        def one_layer(xs):
            a, b, pl = xs
            d = (a.astype(jnp.float32) @ b.astype(jnp.float32)) * scale
            if "w_q4" in pl:
                group = (2 * pl["w_q4"].shape[-2]) // pl["scale4"].shape[-2]
                w = quant.dequantize_weight_int4(pl, dtype=jnp.float32) + d
                return quant.quantize_linear_int4({"w": w}, group=group)
            if "w_q" in pl:
                w = (pl["w_q"].astype(jnp.float32)
                     * pl["scale"][..., None, :].astype(jnp.float32)) + d
                return quant.quantize_linear({"w": w})
            return {"w": (pl["w"].astype(jnp.float32) + d).astype(pl["w"].dtype)}

        stacked = {k: p[k] for k in weight_keys}
        newp = jax.lax.map(one_layer, (pair["a"], pair["b"], stacked))
        if "b" in p:
            newp["b"] = p["b"]
        layers[name] = newp
    out = dict(llm_params)
    out["layers"] = layers
    return out


def save(path: str, lora: Dict[str, dict], scale: float = 1.0) -> None:
    """One .npz: flat {name.a, name.b} arrays + the merge scale."""
    import numpy as np

    flat = {"__scale__": np.asarray(scale, np.float32)}
    for name, pair in lora.items():
        flat[f"{name}.a"] = np.asarray(pair["a"])
        flat[f"{name}.b"] = np.asarray(pair["b"])
    np.savez(path, **flat)


def load(path: str) -> tuple:
    """-> (lora tree, scale)."""
    import numpy as np

    with np.load(path) as z:
        scale = float(z["__scale__"]) if "__scale__" in z.files else 1.0
        tree: Dict[str, dict] = {}
        for k in z.files:
            if k == "__scale__":
                continue
            name, leaf = k.rsplit(".", 1)
            tree.setdefault(name, {})[leaf] = z[k]
    return tree, scale
