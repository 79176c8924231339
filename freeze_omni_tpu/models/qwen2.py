"""Qwen2-class decoder-only LLM backbone, TPU-native.

The reference wraps a HF Qwen2-7B-Instruct via AutoModelForCausalLM and only
ever calls it with `inputs_embeds` + a growing legacy KV tuple
(models/audioLLM.py:408-427, 479-484). Here the backbone is a pure function
over a params pytree with:

- a **static-shape KV cache** [L, B, S_max, Hkv, dk] + per-sequence length,
  instead of unbounded concatenation: chunks arrive padded to a static length
  with a validity mask, valid tokens are compacted into the cache with a
  scatter, and attention masks derive from (length, rank) — so one compiled
  step serves every chunk of a session and sessions batch along B;
- GQA (4 kv heads vs 28 q heads), RoPE, RMSNorm, SwiGLU, q/k/v biases, all
  matching the Qwen2 architecture;
- prefill-with-embeddings as the primary API (the pipeline never feeds token
  ids), plus `embed_tokens`/`logits` for the text-generation path
  (bin/inference.py:140-183) and TTS re-embedding (bin/inference.py:86-90).

Weights are annotated for tensor parallelism in parallel/mesh.py (heads and ffn
sharded over the 'model' axis; ICI collectives inserted by XLA under pjit).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LLMConfig
from .layers import (NEG_INF, embedding, linear, linear_init, rms_norm,
                     rms_norm_init, rotary_embed)


class KVCache(NamedTuple):
    """Static-shape KV cache. When k_scale/v_scale are present the cache is
    weight-only int8 (per-token-per-kv-head symmetric scales, quantized on
    append, dequantized inside the attention op) — this halves the KV HBM
    footprint, which is what bounds per-session context length at high
    stream counts (the reference instead grows KV unboundedly at ~2 GB/user,
    audioLLM.py:416-419 + scripts/run_demo_server.sh:8-9)."""

    k: jnp.ndarray       # [L, B, S_max, Hkv, dk] (bf16/f32, or int8 if quant)
    v: jnp.ndarray       # [L, B, S_max, Hkv, dk]
    length: jnp.ndarray  # [B] int32 — valid prefix length per sequence
    k_scale: Optional[jnp.ndarray] = None  # [L, B, S_max, Hkv] f32
    v_scale: Optional[jnp.ndarray] = None


def init_cache(cfg: LLMConfig, batch: int = 1, max_len: Optional[int] = None,
               dtype=jnp.bfloat16, quant_bits: Optional[int] = None) -> KVCache:
    s = max_len or cfg.max_kv_len
    shape = (cfg.num_layers, batch, s, cfg.num_kv_heads, cfg.head_dim)
    if quant_bits is None:
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                       length=jnp.zeros((batch,), jnp.int32))
    if quant_bits != 8:
        raise ValueError(f"unsupported kv quant_bits {quant_bits!r} (8 or None)")
    return KVCache(
        k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
        length=jnp.zeros((batch,), jnp.int32),
        k_scale=jnp.zeros(shape[:-1], jnp.float32),
        v_scale=jnp.zeros(shape[:-1], jnp.float32))


def cache_axes(cache: KVCache) -> KVCache:
    """Batch-axis index per leaf (for row gather/scatter over sessions);
    mirrors the cache's own structure so quantized and float caches both map."""
    return KVCache(k=1, v=1, length=0,
                   k_scale=None if cache.k_scale is None else 1,
                   v_scale=None if cache.v_scale is None else 1)


def quantize_kv_vectors(x: jnp.ndarray):
    """Symmetric int8 quantization over the last (head_dim) axis.
    x: [..., dk] -> (q int8 [..., dk], scale f32 [...])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def quantize_cache(kv: KVCache, quant_bits: int = 8) -> KVCache:
    """Float cache -> int8 cache (per-token-per-head scales). Used to seed
    quantized session rows from a float role prefill and for cross-layout
    session migration."""
    if kv.k_scale is not None:
        return kv
    if quant_bits != 8:
        raise ValueError(f"unsupported kv quant_bits {quant_bits!r}")
    kq, ks = quantize_kv_vectors(kv.k)
    vq, vs = quantize_kv_vectors(kv.v)
    return KVCache(k=kq, v=vq, length=kv.length, k_scale=ks, v_scale=vs)


def dequantize_cache(kv: KVCache, dtype=jnp.bfloat16) -> KVCache:
    """int8 cache -> float cache (canonical layout for export/migration)."""
    if kv.k_scale is None:
        return kv
    k = (kv.k.astype(jnp.float32) * kv.k_scale[..., None]).astype(dtype)
    v = (kv.v.astype(jnp.float32) * kv.v_scale[..., None]).astype(dtype)
    return KVCache(k=k, v=v, length=kv.length)


def init_layer_stack(key, cfg: LLMConfig, num_layers: int, dtype=jnp.bfloat16):
    """Stacked decoder-layer params [num_layers, ...] (shared by the Qwen2
    backbone and the LLaMA-architecture speech decoder's three stacks).

    Each weight group is created directly at its stacked [L, ...] shape:
    building per-layer trees and jnp.stack-ing them doubles peak HBM (the
    parts and the stack are resident together), which is what made full-depth
    7B init appear to OOM a 16 GB chip in round 1."""
    D, H, Hkv, dk = cfg.hidden, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = num_layers
    ks = jax.random.split(key, 7)

    def lin(k, i, o, bias):
        bound = 1.0 / math.sqrt(i)
        mk = jax.jit(lambda k: jax.random.uniform(k, (L, i, o), dtype,
                                                  -bound, bound))
        p = {"w": mk(k)}
        if bias:
            p["b"] = jax.random.uniform(jax.random.fold_in(k, 1), (L, o),
                                        dtype, -bound, bound)
        return p

    return {
        "ln1": {"scale": jnp.ones((L, D), dtype)},
        "q": lin(ks[0], D, H * dk, cfg.qkv_bias),
        "k": lin(ks[1], D, Hkv * dk, cfg.qkv_bias),
        "v": lin(ks[2], D, Hkv * dk, cfg.qkv_bias),
        "o": lin(ks[3], H * dk, D, False),
        "ln2": {"scale": jnp.ones((L, D), dtype)},
        "gate": lin(ks[4], D, cfg.ffn, False),
        "up": lin(ks[5], D, cfg.ffn, False),
        "down": lin(ks[6], cfg.ffn, D, False),
    }


def init_params(key, cfg: LLMConfig, dtype=jnp.bfloat16) -> dict:
    D = cfg.hidden
    keys = jax.random.split(key, 3)
    params = {
        # generate directly in the target dtype: a [152k, 3584] f32 staging
        # array would transiently cost 2.2 GB on-chip
        "embed": {"w": jax.random.normal(keys[0], (cfg.vocab_size, D),
                                         dtype=dtype) * jnp.asarray(0.02, dtype)},
        "layers": init_layer_stack(keys[2], cfg, cfg.num_layers, dtype),
        "final_norm": rms_norm_init(D, dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = linear_init(keys[1], D, cfg.vocab_size, bias=False,
                                        dtype=dtype)
    return params


def embed_tokens(params, ids: jnp.ndarray) -> jnp.ndarray:
    p = params["embed"]
    if "w_q" in p:  # per-row int8 (ops/quant.py)
        rows = jnp.take(p["w_q"], ids, axis=0).astype(jnp.float32)
        out = rows * jnp.take(p["scale"], ids, axis=0)[..., None]
        return out.astype(jnp.bfloat16)
    return embedding(p, ids)


def logits(params, cfg: LLMConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    if cfg.tie_embeddings:
        return jnp.einsum("...d,vd->...v", hidden, params["embed"]["w"])
    return linear(params["lm_head"], hidden)


def _gqa_attention(q, k_all, v_all, mask, rep: int):
    """q: [B,T,H,dk]; k_all/v_all: [B,S,Hkv,dk]; mask: [B,T,S] bool."""
    B, T, H, dk = q.shape
    Hkv = k_all.shape[2]
    q = q.reshape(B, T, Hkv, rep, dk)
    scores = jnp.einsum("bthrd,bshd->bhrts", q, k_all) / math.sqrt(dk)
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhrts,bshd->bthrd", attn, v_all)
    # follow the query/activation dtype: a wider cache (e.g. f32 KV under
    # bf16 activations) must not upcast the residual-stream carry
    return out.reshape(B, T, H * dk).astype(q.dtype)


def forward(params, cfg: LLMConfig, embeds: jnp.ndarray, mask: jnp.ndarray,
            cache: KVCache, pos_offset=0, lora=None, lora_scale: float = 1.0
            ) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill/decode step over a static-length chunk of embeddings.

    embeds: [B, T, D] (chunk padded to static T); mask: [B, T] validity.
    Valid tokens are appended compactly to the cache; returns (hidden [B, T, D],
    updated cache). Invalid positions produce garbage hidden states — callers
    index the last *valid* position (see `last_valid_index`).

    pos_offset ([B] or scalar) is subtracted from RoPE positions (cache slots
    are unaffected): the speech decoder restarts positions after its KV prefix
    (models/decoder/decoder.py:337-341).

    lora: optional stacked adapter tree (models/lora.py — the working form of
    the reference's dead LoRA block, audioLLM.py:150-157): {proj_name:
    {"a": [L, in, r], "b": [L, r, out]}}; each named projection gains
    lora_scale * (h @ A) @ B while the base weights stay frozen.
    """
    B, T, D = embeds.shape
    H, Hkv, dk = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = H // Hkv
    S = cache.k.shape[2]

    maski = mask.astype(jnp.int32)
    rank = jnp.cumsum(maski, axis=1) - 1            # [B, T] rank among valid
    n_new = jnp.sum(maski, axis=1)                  # [B]
    positions = cache.length[:, None] + jnp.maximum(rank, 0)  # [B, T]
    rope_positions = positions - jnp.asarray(pos_offset).reshape(-1, 1)
    # Invalid chunk tokens are parked in scratch slot S-1; the runtime invariant
    # is length + n_new <= S-1 (sessions reset/evict before the cache fills), so
    # the scratch slot is never visible to any valid query.
    dest = jnp.where(mask, positions, S - 1)

    cos, sin = rotary_embed(rope_positions.reshape(-1), dk, cfg.rope_theta)
    cos = cos.reshape(B, T, dk)
    sin = sin.reshape(B, T, dk)

    slot = jnp.arange(S)[None, None, :]             # [1, 1, S]
    # key slot s visible to query t iff s < length + rank_t + 1
    visible = slot < (cache.length[:, None, None] + rank[:, :, None] + 1)
    attn_mask = visible & mask[:, :, None]          # invalid queries see nothing

    batch_idx = jnp.arange(B)[:, None].repeat(T, 1)  # [B, T]

    def apply_rot(x, cos, sin):
        d2 = x.shape[-1] // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        # rotate in f32, return in the param dtype (keeps the scan carry stable)
        y = x * cos[:, :, None, :] + rot * sin[:, :, None, :]
        return y.astype(x.dtype)

    quant = cache.k_scale is not None
    # visible-slot count per query for the fused quantized-attention kernel:
    # query t sees slots [0, length + rank_t + 1); invalid queries see nothing
    qend = jnp.where(mask, cache.length[:, None] + rank + 1, 0) \
        .astype(jnp.int32) if quant else None

    def layer_fn(x, inputs):
        """One transformer layer; inputs carry THIS layer's params and cache
        slices [B, S, Hkv, dk]; returns (hidden, updated cache slices)."""
        lp, lo = inputs["lp"], inputs.get("lora")
        k_cache, v_cache = inputs["k"], inputs["v"]  # [B, S, Hkv, dk]

        def proj(name, h):
            y = linear(lp[name], h)
            if lo is not None and name in lo:  # trace-time membership
                from . import lora as lora_mod

                y = y + lora_mod.delta(lo[name], h, lora_scale)
            return y

        h = rms_norm(lp["ln1"], x, cfg.rms_eps)
        q = proj("q", h).reshape(B, T, H, dk)
        k = proj("k", h).reshape(B, T, Hkv, dk)
        v = proj("v", h).reshape(B, T, Hkv, dk)
        q = apply_rot(q, cos, sin)
        k = apply_rot(k, cos, sin)
        if quant:
            from ..ops import attention as att_ops

            kq, ksc = quantize_kv_vectors(k)
            vq, vsc = quantize_kv_vectors(v)
            k_cache = k_cache.at[batch_idx, dest].set(kq)
            v_cache = v_cache.at[batch_idx, dest].set(vq)
            ks_cache = inputs["ks"].at[batch_idx, dest].set(ksc)
            vs_cache = inputs["vs"].at[batch_idx, dest].set(vsc)
            att = att_ops.prefill_quant(q, k_cache, ks_cache, v_cache,
                                        vs_cache, qend)
            att = att.reshape(B, T, H * dk).astype(q.dtype)
            out_caches = {"k": k_cache, "v": v_cache,
                          "ks": ks_cache, "vs": vs_cache}
        else:
            k_cache = k_cache.at[batch_idx, dest].set(k.astype(k_cache.dtype))
            v_cache = v_cache.at[batch_idx, dest].set(v.astype(v_cache.dtype))
            att = _gqa_attention(q, k_cache, v_cache, attn_mask, rep)
            out_caches = {"k": k_cache, "v": v_cache}
        x = x + proj("o", att)
        h2 = rms_norm(lp["ln2"], x, cfg.rms_eps)
        ffn = proj("down", jax.nn.silu(proj("gate", h2)) * proj("up", h2))
        x = x + ffn
        return x, out_caches

    if isinstance(params["layers"], (list, tuple)):
        # unrolled layer loop (legacy per-layer param lists); the production
        # path is the stacked scan below, which works for bf16 AND int8
        x = embeds
        outs = []
        for i, lp in enumerate(params["layers"]):
            inp = {"lp": lp, "k": cache.k[i], "v": cache.v[i]}
            if quant:
                inp.update(ks=cache.k_scale[i], vs=cache.v_scale[i])
            if lora is not None:
                inp["lora"] = jax.tree.map(lambda t: t[i], lora)
            x, oc = layer_fn(x, inp)
            outs.append(oc)
        stacked = {key: jnp.stack([o[key] for o in outs])
                   for key in outs[0]}
    else:
        # The FULL stacked cache rides the scan as CARRY, each iteration
        # dynamic-slicing its layer in and dynamic-update-slicing it back.
        # NOT as xs/stacked-ys: scan materializes ys into a freshly
        # allocated [L, ...] buffer, so a cache-as-ys program holds TWO
        # full cache copies (plus, under buffer donation, a same-size
        # defensive temp — measured 4.1 GiB out + 4.2 GiB temp on the
        # 128-session x 1024-slot int8 pool, the allocation that OOMed the
        # 16 GB chip). A carry updated at a loop-dependent index is the
        # in-place pattern XLA's loop aliasing handles: temp drops to the
        # per-layer working set and a donated pool updates truly in place.
        cache_carry = {"k": cache.k, "v": cache.v}
        if quant:
            cache_carry.update(ks=cache.k_scale, vs=cache.v_scale)
        xs = {"lp": params["layers"]}
        if lora is not None:
            xs["lora"] = lora

        def scan_fn(carry, inputs):
            x, caches, i = carry
            inp = dict(inputs)
            for key, full in caches.items():
                inp[key] = jax.lax.dynamic_index_in_dim(full, i, 0,
                                                        keepdims=False)
            x, oc = layer_fn(x, inp)
            caches = {
                key: jax.lax.dynamic_update_index_in_dim(
                    caches[key], oc[key], i, 0)
                for key in caches}
            return (x, caches, i + 1), None

        (x, stacked, _), _ = jax.lax.scan(
            scan_fn, (embeds, cache_carry, jnp.asarray(0, jnp.int32)), xs)
    x = rms_norm(params["final_norm"], x, cfg.rms_eps)

    new_cache = KVCache(k=stacked["k"], v=stacked["v"],
                        length=cache.length + n_new,
                        k_scale=stacked.get("ks"), v_scale=stacked.get("vs"))
    return x, new_cache


def roll_kv(cfg: LLMConfig, kv: KVCache, prefix_len: jnp.ndarray,
            keep_recent: int, do_roll: jnp.ndarray) -> KVCache:
    """Sliding-window KV compaction with a pinned prefix (per batch row).

    For rows where do_roll: keep slots [0, prefix_len) (the system-role
    prefill — the "attention sink" tokens) and move the most recent
    `keep_recent` conversation entries down to [prefix_len, prefix_len + W).
    Cached K vectors carry RoPE applied at their original positions; the move
    shifts every kept conversation entry by the SAME offset, so one extra
    rotation by that offset re-indexes them to within-cache positions — the
    StreamingLLM eviction semantics (original contextual K/V preserved,
    relative distances measured inside the cache). For a single layer the
    rolled cache is numerically identical to a fresh prefill of
    [prefix, window] (layer-0 K/V are context-free); deeper layers keep their
    full-history contextual values, which is the point: this replaces the
    reference's unbounded KV growth (audioLLM.py:416-419) and round-1's hard
    context reset — dialog history inside the window survives.

    prefix_len/do_roll: [B]. Rows with do_roll=False pass through untouched.
    """
    Lc, B, S, Hkv, dk = kv.k.shape
    length = kv.length
    W = jnp.clip(jnp.asarray(keep_recent), 0, length - prefix_len)     # [B]
    start = length - W                                                 # [B]
    s_idx = jnp.arange(S)[None, :]                                     # [1,S]
    in_prefix = s_idx < prefix_len[:, None]                            # [B,S]
    src = jnp.where(in_prefix, s_idx,
                    s_idx - prefix_len[:, None] + start[:, None])
    src = jnp.clip(src, 0, S - 1)
    # uniform shift of the moved entries: new_pos - old_pos
    delta = jnp.where(in_prefix, 0,
                      prefix_len[:, None] - start[:, None])            # [B,S]

    cos, sin = rotary_embed(delta.reshape(-1), dk, cfg.rope_theta)
    cos = cos.reshape(B, S, 1, dk)
    sin = sin.reshape(B, S, 1, dk)

    new_len = prefix_len + W
    valid = s_idx < new_len[:, None]                                   # [B,S]
    sel4 = (do_roll[:, None] & valid)[:, :, None, None]                # [B,S,1,1]
    zero4 = (do_roll[:, None] & ~valid)[:, :, None, None]

    def rot1(x):  # x: [B, S, Hkv, dk] (one layer)
        d2 = dk // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        r = jnp.concatenate([-x2, x1], axis=-1)
        return (x * cos + r * sin).astype(x.dtype)

    idx4 = src[:, :, None, None]                     # [B, S, 1, 1]

    if kv.k_scale is None:
        def rot(x):  # x: [L, B, S, Hkv, dk]
            d2 = dk // 2
            x1, x2 = x[..., :d2], x[..., d2:]
            r = jnp.concatenate([-x2, x1], axis=-1)
            return (x * cos[None] + r * sin[None]).astype(x.dtype)

        idx = src[None, :, :, None, None]            # [1, B, S, 1, 1]
        k_rolled = rot(jnp.take_along_axis(kv.k, idx, axis=2))
        v_rolled = jnp.take_along_axis(kv.v, idx, axis=2)
        sel = sel4[None]
        zero_sel = zero4[None]
        k_new = jnp.where(sel, k_rolled, jnp.where(zero_sel, 0, kv.k))
        v_new = jnp.where(sel, v_rolled, jnp.where(zero_sel, 0, kv.v))
        return KVCache(k=k_new, v=v_new,
                       length=jnp.where(do_roll, new_len, length))

    # int8 cache: K must be dequantized to rotate (then re-quantized: one
    # extra quantization error on rolled entries only); V and all scales move
    # losslessly as-is. Layer-by-layer (lax.map) so the f32 transient is one
    # layer's worth, not the whole [L, B, S, Hkv, dk] tree — at 128 sessions x
    # kv_len 1024 the full-tree dequant would transiently cost ~15 GB.
    idx3 = src[:, :, None]                           # [B, S, 1] for scales

    def per_layer(layer):
        kq, ks, vq, vs = layer                       # [B, S, Hkv, (dk)]
        kf = jnp.take_along_axis(kq, idx4, axis=1).astype(jnp.float32) * \
            jnp.take_along_axis(ks, idx3, axis=1)[..., None]
        kq2, ks2 = quantize_kv_vectors(rot1(kf))
        vq2 = jnp.take_along_axis(vq, idx4, axis=1)
        vs2 = jnp.take_along_axis(vs, idx3, axis=1)
        k_new = jnp.where(sel4, kq2, jnp.where(zero4, 0, kq))
        v_new = jnp.where(sel4, vq2, jnp.where(zero4, 0, vq))
        ks_new = jnp.where(sel4[..., 0], ks2, jnp.where(zero4[..., 0], 0, ks))
        vs_new = jnp.where(sel4[..., 0], vs2, jnp.where(zero4[..., 0], 0, vs))
        return k_new, ks_new, v_new, vs_new

    k_new, ks_new, v_new, vs_new = jax.lax.map(
        per_layer, (kv.k, kv.k_scale, kv.v, kv.v_scale))
    return KVCache(k=k_new, v=v_new,
                   length=jnp.where(do_roll, new_len, length),
                   k_scale=ks_new, v_scale=vs_new)


def last_valid_index(mask: jnp.ndarray) -> jnp.ndarray:
    """Index of the last valid token per row of a [B, T] mask."""
    T = mask.shape[1]
    idx = jnp.arange(T)[None, :]
    return jnp.max(jnp.where(mask, idx, -1), axis=1)
