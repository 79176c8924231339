"""Weight-only int8 quantization for the frozen LLM backbone.

The reference serves the 7B in fp16/bf16 (~15 GB/replica,
scripts/run_demo_server.sh:8-9). Per-output-channel symmetric int8 halves the
layer weights to ~6.5 GB so the FULL 28-layer Qwen2-7B fits one 16 GB v5e chip
alongside embeddings, caches and XLA workspace. Dequantization is a per-column
scale multiply that XLA fuses into the matmul epilogue; quality for 7B-class
models with per-channel weight-only int8 is established practice.

A quantized linear is {"w_q": int8 [in, out], "scale": f32 [out], "b"?};
models/layers.linear dispatches on the presence of "w_q".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear(p: dict) -> dict:
    """{"w": [in, out], "b"?} -> {"w_q": int8, "scale": f32, "b"?}.
    Handles stacked layer weights ([L, in, out]) too: scales are per (layer,
    output-channel)."""
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # over input dim
    scale = jnp.maximum(amax / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale.squeeze(-2).astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def dequantize_weight(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (p["w_q"].astype(jnp.float32) * p["scale"][..., None, :]).astype(dtype)


def quantize_embedding(p: dict) -> dict:
    """{"w": [V, D]} -> {"w_q": int8, "scale": f32 [V]} (per-row symmetric)."""
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    return {"w_q": jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8),
            "scale": scale[..., 0].astype(jnp.float32)}


def quantize_llm_params(params: dict, quantize_embeddings: bool = True) -> dict:
    """Quantize the transformer layer projections (q/k/v/o/gate/up/down) and —
    by default — the token embedding (per-row) and lm_head (per-column); norms
    stay full precision.

    Layers are returned as a per-layer LIST (models/qwen2.forward unrolls it):
    stacked int8 arrays feeding Pallas calls inside a while-loop trigger a
    whole-stack relayout copy at loop entry on TPU and OOM the chip."""
    out = dict(params)
    stacked = params["layers"]
    num_layers = jax.tree.leaves(stacked)[0].shape[0]
    layers = []
    for i in range(num_layers):
        lp = jax.tree.map(lambda a: a[i], stacked)
        for name in ("q", "k", "v", "o", "gate", "up", "down"):
            lp[name] = quantize_linear(lp[name])
        layers.append(lp)
    out["layers"] = layers
    if quantize_embeddings:
        out["embed"] = quantize_embedding(params["embed"])
        if "lm_head" in params:
            out["lm_head"] = quantize_linear(params["lm_head"])
    return out


def quantized_bytes(params: dict) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
