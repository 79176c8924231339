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


INT4_GROUP = 64  # input-dim group size for int4 scales (sized so the
# Pallas kernel gets 8 scale groups per 256-packed-row k-step — a legal
# Mosaic block; finer groups also quantize better than the common 128)


def quantize_linear_int4(p: dict, group: int = INT4_GROUP) -> dict:
    """{"w": [..., in, out]} -> {"w_q4": uint8 [..., in/2, out],
    "scale4": f32 [..., in/group, out], "b"?}. Symmetric 4-bit (-7..7) with
    per-(input-group, output-channel) scales; two nibbles pack along the
    input dim (even rows -> low nibble). Halves HBM weight traffic again vs
    int8 — decode is weight-read-bound."""
    w = p["w"].astype(jnp.float32)
    K, O = w.shape[-2], w.shape[-1]
    assert K % 2 == 0 and K % group == 0, (K, group)
    lead = w.shape[:-2]
    wg = w.reshape(*lead, K // group, group, O)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2) / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / scale[..., None, :]), -7, 7)
    q = q.reshape(*lead, K, O).astype(jnp.int8)
    u = (q + 8).astype(jnp.uint8)
    packed = (u[..., 0::2, :] | (u[..., 1::2, :] << 4)).astype(jnp.uint8)
    out = {"w_q4": packed, "scale4": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def dequantize_weight_int4(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Unpack {"w_q4","scale4"} back to [..., in, out] in `dtype`."""
    packed = p["w_q4"]
    lead = packed.shape[:-2]
    K2, O = packed.shape[-2], packed.shape[-1]
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    w = jnp.stack([lo, hi], axis=-2).reshape(*lead, 2 * K2, O)
    G = p["scale4"].shape[-2]
    group = (2 * K2) // G
    wg = w.reshape(*lead, G, group, O).astype(dtype)
    return (wg * p["scale4"][..., None, :].astype(dtype)
            ).reshape(*lead, 2 * K2, O)


def quantize_embedding(p: dict) -> dict:
    """{"w": [V, D]} -> {"w_q": int8, "scale": f32 [V]} (per-row symmetric)."""
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    return {"w_q": jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8),
            "scale": scale[..., 0].astype(jnp.float32)}


def quantize_llm_params(params: dict, quantize_embeddings: bool = True,
                        bits: int = 8) -> dict:
    """Quantize the transformer layer projections (q/k/v/o/gate/up/down) and —
    by default — the token embedding (per-row) and lm_head (per-column); norms
    stay full precision.

    Layers stay STACKED ([L, in, out] int8): qwen2.forward scans over the
    stack, so the per-layer dequant is loop-variant (indexed) and XLA cannot
    hoist it — measured 10.8 ms/token for 28-layer 7B dims on one v5e chip
    (vs 19.2 ms/token bf16 = the HBM-bandwidth ratio). Quantization runs one
    group at a time under jit so the bf16 source and the int8 copy of only
    ONE group coexist; round 1's 'int8 in loops OOMs' was a misdiagnosed init
    peak (whole bf16 tree + whole int8 tree resident together)."""
    quantizer = quantize_linear if bits == 8 else quantize_linear_int4
    out = dict(params)
    layers = dict(params["layers"]) if isinstance(params["layers"], dict) else \
        params["layers"]
    if isinstance(layers, dict):
        q = jax.jit(quantizer)
        for name in ("q", "k", "v", "o", "gate", "up", "down"):
            layers[name] = jax.block_until_ready(q(layers[name]))
        out["layers"] = layers
    else:  # legacy per-layer list
        out["layers"] = [
            {**lp, **{n: quantizer(lp[n])
                      for n in ("q", "k", "v", "o", "gate", "up", "down")}}
            for lp in layers]
    if quantize_embeddings:
        out["embed"] = quantize_embedding(params["embed"])
        if "lm_head" in params:
            out["lm_head"] = quantizer(params["lm_head"])
    return out


def init_quantized_llm(key, cfg, dtype=jnp.bfloat16, bits: int = 8) -> dict:
    """Random-init a Qwen2 param tree directly in int8, one weight group at a
    time, so peak HBM stays ~one group above the final int8 footprint
    (7.1 GiB resident for 28-layer 7B dims vs 13.2 GiB bf16).

    `quantize_llm_params` needs the whole bf16 tree resident first — fine for
    converted checkpoints streamed from host, but on-device random init of the
    full 7B would peak at bf16+int8 together. Benchmarks and weightless
    serving use this instead."""
    import math

    import numpy as np

    # generation speed: the ~7e9 random elements of a 28-layer 7B init cost
    # ~50 s (warm) under the default threefry PRNG on a v5e vs ~16 s under
    # the hardware rbg implementation (measured A/B) — and this init IS the
    # dominant term of serving warm-restart time (BENCH r3 warm_params 85 s).
    # rbg stays deterministic per key; values differ from threefry, which is
    # fine for random-weight init (nothing goldens these bytes).
    data = np.asarray(jax.random.key_data(key)).ravel()
    key = jax.random.key(int(data[-1]), impl="rbg")

    L, D = cfg.num_layers, cfg.hidden
    H, Hkv, dk = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = jax.random.split(key, 10)

    quantizer = quantize_linear if bits == 8 else quantize_linear_int4

    def q_group(k, i, o, bias):
        bound = 1.0 / math.sqrt(i)
        mk = jax.jit(lambda k: quantizer(
            {"w": jax.random.uniform(k, (L, i, o), dtype, -bound, bound)}))
        p = jax.block_until_ready(mk(k))
        if bias:
            p["b"] = jax.random.uniform(jax.random.fold_in(k, 1), (L, o),
                                        dtype, -bound, bound)
        return p

    layers = {
        "ln1": {"scale": jnp.ones((L, D), dtype)},
        "q": q_group(ks[0], D, H * dk, cfg.qkv_bias),
        "k": q_group(ks[1], D, Hkv * dk, cfg.qkv_bias),
        "v": q_group(ks[2], D, Hkv * dk, cfg.qkv_bias),
        "o": q_group(ks[3], H * dk, D, False),
        "ln2": {"scale": jnp.ones((L, D), dtype)},
        "gate": q_group(ks[4], D, cfg.ffn, False),
        "up": q_group(ks[5], D, cfg.ffn, False),
        "down": q_group(ks[6], cfg.ffn, D, False),
    }

    def q_embed(k):
        mk = jax.jit(lambda k: quantize_embedding(
            {"w": jax.random.normal(k, (cfg.vocab_size, D), dtype) * 0.02}))
        return jax.block_until_ready(mk(k))

    params = {"layers": layers, "embed": q_embed(ks[7]),
              "final_norm": {"scale": jnp.ones((D,), dtype)}}
    if not cfg.tie_embeddings:
        mk = jax.jit(lambda k: quantize_linear(
            {"w": jax.random.normal(k, (D, cfg.vocab_size), dtype) * 0.02}))
        params["lm_head"] = jax.block_until_ready(mk(ks[8]))
    return params


def quantized_bytes(params: dict) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
