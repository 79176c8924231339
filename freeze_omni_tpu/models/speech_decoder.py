"""AR speech-token decoder (LLaMA architecture), TPU-native.

Functional re-design of models/decoder/decoder.py:32-367 (`LLM2TTSCodecAR`):

- `pre_nn`: num_layers//2 LLaMA layers, *bidirectional* over the LLM hidden
  states (decoder.py:156-188);
- `prefix_prefill`: a separate full stack of LLaMA layers runs over the prefix
  (LLM hidden states) and writes its K/V into the main cache — prefix tuning as
  in decoder.py:121-154;
- `prefill`: main stack over [bos-emb, pre-NN output]; RoPE positions restart
  at 0 after the prefix (decoder.py:337-341);
- `decode_segment`: scans N decode steps on-device (embed -> main stack ->
  RMSNorm -> out head -> repetition penalty over a ring of recent tokens ->
  top-k sample), returning the token block + eos flag. The reference's
  per-token Python loop with DynamicCache (decoder.py:335-367) becomes a
  static-shape lax.scan so the TPU generates a full codec chunk per dispatch.

Specials: bos/sos/eos/pad = vocab..vocab+3 (decoder.py:79-87, 205-208).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LLMConfig, SpeechDecoderConfig
from . import qwen2
from .layers import (NEG_INF, embedding, linear, linear_init, rms_norm,
                     rms_norm_init, rotary_embed)


def _llm_cfg(cfg: SpeechDecoderConfig) -> LLMConfig:
    """The decoder's stacks are standard (non-GQA, bias-free) LLaMA layers."""
    return LLMConfig(
        hidden=cfg.hidden, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        num_kv_heads=cfg.num_heads, ffn=cfg.ffn, vocab_size=cfg.full_vocab,
        rope_theta=cfg.rope_theta, rms_eps=cfg.rms_eps, max_kv_len=cfg.max_kv_len,
        qkv_bias=False,
    )


class DecoderCache(NamedTuple):
    kv: qwen2.KVCache
    prefix_len: jnp.ndarray  # [B] int32 — RoPE offset for the main stack


def init_cache(cfg: SpeechDecoderConfig, batch: int = 1,
               dtype=jnp.float32) -> DecoderCache:
    return DecoderCache(
        kv=qwen2.init_cache(_llm_cfg(cfg), batch, dtype=dtype),
        prefix_len=jnp.zeros((batch,), jnp.int32),
    )


def init_params(key, cfg: SpeechDecoderConfig, dtype=jnp.float32) -> dict:
    assert cfg.idim == cfg.hidden, "embedding dim must equal hidden"
    lcfg = _llm_cfg(cfg)
    ks = jax.random.split(key, 5)
    params = {
        "embedding": {"w": (jax.random.normal(ks[0], (cfg.full_vocab, cfg.idim))
                            * 0.02).astype(dtype)},
        "pre_nn": qwen2.init_layer_stack(ks[1], lcfg, cfg.num_pre_nn_layers, dtype),
        "layers": qwen2.init_layer_stack(ks[2], lcfg, cfg.num_layers, dtype),
        "final_norm": rms_norm_init(cfg.hidden, dtype),
        "out": linear_init(ks[3], cfg.hidden, cfg.full_vocab, dtype=dtype),
    }
    if cfg.use_prefix_kv:
        params["prefix"] = qwen2.init_layer_stack(ks[4], lcfg, cfg.num_layers, dtype)
    return params


# ---------------------------------------------------------------------------
# pre-NN (bidirectional, no cache)
# ---------------------------------------------------------------------------


def pre_nn(params, cfg: SpeechDecoderConfig, hidden: jnp.ndarray,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """hidden: [B, T, D]; mask: [B, T] validity (full block attention among
    valid positions, decoder.py:170-175). Returns [B, T, D] un-normed."""
    B, T, D = hidden.shape
    H, dk = cfg.num_heads, cfg.head_dim
    if mask is None:
        mask = jnp.ones((B, T), bool)
    attn_mask = mask[:, None, :] & mask[:, :, None]  # [B, T, T]
    cos, sin = rotary_embed(jnp.arange(T), dk, cfg.rope_theta)

    def rot(x):
        d2 = x.shape[-1] // 2
        r = jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)
        return x * cos[None, :, None, :] + r * sin[None, :, None, :]

    def layer_fn(x, lp):
        h = rms_norm(lp["ln1"], x, cfg.rms_eps)
        q = rot(linear(lp["q"], h).reshape(B, T, H, dk))
        k = rot(linear(lp["k"], h).reshape(B, T, H, dk))
        v = linear(lp["v"], h).reshape(B, T, H, dk)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(dk)
        scores = jnp.where(attn_mask[:, None], scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * dk)
        x = x + linear(lp["o"], o)
        h2 = rms_norm(lp["ln2"], x, cfg.rms_eps)
        x = x + linear(lp["down"], jax.nn.silu(linear(lp["gate"], h2)) * linear(lp["up"], h2))
        return x, None

    x, _ = jax.lax.scan(layer_fn, hidden, params["pre_nn"])
    return x  # no final norm (decoder.py:188)


# ---------------------------------------------------------------------------
# prefix + prefill + decode
# ---------------------------------------------------------------------------


def prefix_prefill(params, cfg: SpeechDecoderConfig, prefix: jnp.ndarray,
                   mask: jnp.ndarray, cache: DecoderCache) -> DecoderCache:
    """Run the prefix stack over the LLM hidden states and deposit its K/V into
    the main cache (decoder.py:127-154)."""
    fake = {"layers": params["prefix"], "final_norm": {"scale": jnp.ones((cfg.hidden,))}}
    _, kv = qwen2.forward(fake, _llm_cfg(cfg), prefix, mask, cache.kv)
    n_valid = jnp.sum(mask.astype(jnp.int32), axis=1)
    return DecoderCache(kv=kv, prefix_len=cache.prefix_len + n_valid)


def prefill(params, cfg: SpeechDecoderConfig, embeds: jnp.ndarray,
            mask: jnp.ndarray, cache: DecoderCache
            ) -> Tuple[jnp.ndarray, DecoderCache]:
    """Main stack over a block of embeddings (e.g. [bos, pre-NN hidden])."""
    fake = {"layers": params["layers"], "final_norm": params["final_norm"]}
    hidden, kv = qwen2.forward(fake, _llm_cfg(cfg), embeds, mask, cache.kv,
                               pos_offset=cache.prefix_len)
    return hidden, cache._replace(kv=kv)


class DecodeState(NamedTuple):
    cache: DecoderCache
    cur_token: jnp.ndarray   # [B] int32
    recent: jnp.ndarray      # [B, W] ring of recent tokens (pad-filled)
    done: jnp.ndarray        # [B] bool


def init_decode_state(cfg: SpeechDecoderConfig, cache: DecoderCache,
                      penalty_window: int) -> DecodeState:
    b = cache.kv.length.shape[0]
    w = max(penalty_window, 1)
    return DecodeState(
        cache=cache,
        cur_token=jnp.full((b,), cfg.sos_id, jnp.int32),
        recent=jnp.full((b, w), cfg.pad_id, jnp.int32),
        done=jnp.zeros((b,), bool),
    )


def decode_segment(params, cfg: SpeechDecoderConfig, state: DecodeState,
                   rng, n_steps: int, top_k: int, penalty_window: int,
                   penalty: float, active: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, DecodeState]:
    """Generate up to n_steps tokens on-device. Returns ([B, n_steps] tokens —
    eos/pad after the stop position — and the updated state).

    active: optional [B] bool — rows with active=False are frozen in place
    (no cache growth, cur_token/recent/done untouched, output tokens pad).
    This is what lets a resident POOL of streaming-synthesis jobs ride one
    fused dispatch while rows start/finish on different ticks
    (runtime/tts_batch.BatchedTTS)."""
    lcfg = _llm_cfg(cfg)
    fake = {"layers": params["layers"], "final_norm": params["final_norm"]}

    def step(carry, key):
        st = carry
        emb = embedding(params["embedding"], st.cur_token)[:, None]
        fwd_mask = (jnp.ones_like(st.cur_token, bool) if active is None
                    else active.astype(bool))[:, None]
        hidden, kv = qwen2.forward(fake, lcfg, emb, fwd_mask,
                                   st.cache.kv, pos_offset=st.cache.prefix_len)
        lg = linear(params["out"], hidden[:, 0]).astype(jnp.float32)
        if penalty_window > 0:
            present = jnp.any(
                jax.nn.one_hot(st.recent, cfg.full_vocab, dtype=jnp.float32) > 0,
                axis=1)
            # pad-filled empty ring slots must not penalize the pad logit
            present = present & (jnp.arange(cfg.full_vocab) != cfg.pad_id)
            lg = jnp.where(present, lg / penalty, lg)
        probs = jax.nn.softmax(lg, axis=-1)
        vals, idx = jax.lax.top_k(probs, top_k)
        vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
        choice = jax.random.categorical(key, jnp.log(jnp.maximum(vals, 1e-30)))
        nxt = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
        nxt = jnp.where(st.done, cfg.pad_id, nxt)
        done = st.done | (nxt == cfg.eos_id)
        recent = jnp.concatenate([st.recent[:, 1:], nxt[:, None]], axis=1)
        if active is not None:
            nxt = jnp.where(active, nxt, st.cur_token)
            done = jnp.where(active, done, st.done)
            recent = jnp.where(active[:, None], recent, st.recent)
        new_st = DecodeState(cache=st.cache._replace(kv=kv), cur_token=nxt,
                             recent=recent, done=done)
        out_tok = nxt if active is None else \
            jnp.where(active, nxt, cfg.pad_id)
        return new_st, out_tok

    keys = jax.random.split(rng, n_steps)
    state, tokens = jax.lax.scan(step, state, keys)
    return jnp.swapaxes(tokens, 0, 1), state
