"""Chunk-streaming speech encoder, TPU-native.

Functional re-design of the reference encoder stack (models/encoder/encoder.py,
transformer.py, attention.py, subsampling.py):

- Conv2dSubsampling4 (two stride-2 3x3 convs + linear) -> 4x time reduction.
- Pre-LN transformer blocks with relative-positional attention
  (Transformer-XL style u/v biases, rel_shift dropped, matching
  attention.py:370-390) over a *sliding window* of keys.
- The reference keeps a variable-length KV list per layer, concatenating and
  trimming to `chunk_size*left_chunks` every step (attention.py:415-427). Here
  the cache is a fixed-shape, right-aligned, time-ordered buffer
  [L, B, window, H, dk] updated with a static shift+append, so every streaming
  step compiles once and runs with static shapes; a valid-length scalar masks
  warmup slots. Because slots stay time-ordered, the streaming positional
  encoding (pe_index wraparound, attention.py:105-121) reproduces the reference
  exactly.
- Layers are scanned (stacked params) rather than Python-looped.

State is an explicit pytree (`EncoderState`) so per-user sessions batch along a
leading axis in the serving runtime.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import EncoderConfig
from .layers import (conv2d, conv2d_init, layer_norm, layer_norm_init,
                     linear, linear_init, masked_softmax, sinusoidal_pe)


class EncoderState(NamedTuple):
    """Per-session streaming state (replaces the reference's `buffer` list of
    per-layer [K, V] tensors + `pe_index` int, audioLLM.py:377-380)."""

    k_cache: jnp.ndarray  # [L, B, window, H, dk] time-ordered, right-aligned
    v_cache: jnp.ndarray  # [L, B, window, H, dk]
    valid: jnp.ndarray    # [B] int32 — number of valid cached frames
    pe_index: jnp.ndarray  # [B] int32 — streaming PE cursor
    ffn_cache: jnp.ndarray  # [L, B, d, k-1] conv-FFN left context (empty if linear)


def init_state(cfg: EncoderConfig, batch: int = 1, dtype=jnp.float32) -> EncoderState:
    shape = (cfg.num_blocks, batch, cfg.window, cfg.attention_heads, cfg.head_dim)
    lorder = (cfg.positionwise_conv_kernel - 1
              if cfg.positionwise == "conv1d-linear" else 0)
    return EncoderState(
        k_cache=jnp.zeros(shape, dtype),
        v_cache=jnp.zeros(shape, dtype),
        valid=jnp.zeros((batch,), jnp.int32),
        pe_index=jnp.zeros((batch,), jnp.int32),
        ffn_cache=jnp.zeros((cfg.num_blocks, batch, cfg.attention_dim, lorder),
                            dtype),
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_params(key, cfg: EncoderConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8 + cfg.num_blocks)
    d = cfg.attention_dim
    odim = d  # subsampling output dim == attention dim (encoder.py config chain)

    f_sub = ((cfg.input_dim - 1) // 2 - 1) // 2
    sub = {
        "conv1": conv2d_init(keys[0], 1, odim, 3, dtype),
        "conv2": conv2d_init(keys[1], odim, odim, 3, dtype),
        "out": linear_init(keys[2], odim * f_sub, odim, dtype=dtype),
    }
    embed = {
        "lin": linear_init(keys[3], odim, d, dtype=dtype),
        "ln": layer_norm_init(d, dtype),
    }

    def block_init(k):
        ks = jax.random.split(k, 8)
        bound = math.sqrt(6.0 / (cfg.attention_heads * cfg.head_dim + cfg.head_dim))
        p = {
            "ln1": layer_norm_init(d, dtype),
            "q": linear_init(ks[0], d, d, dtype=dtype),
            "k": linear_init(ks[1], d, d, dtype=dtype),
            "v": linear_init(ks[2], d, d, dtype=dtype),
            "o": linear_init(ks[3], d, d, dtype=dtype),
            "ln2": layer_norm_init(d, dtype),
        }
        if cfg.pos_enc == "rel-enc":
            # abs-enc has no linear_pos / pos biases (attention.py:308-312)
            p["pos"] = linear_init(ks[4], d, d, bias=False, dtype=dtype)
            # xavier-uniform as in attention.py:306-307
            p["bias_u"] = jax.random.uniform(
                ks[5], (cfg.attention_heads, cfg.head_dim), dtype, -bound, bound)
            p["bias_v"] = jax.random.uniform(
                ks[6], (cfg.attention_heads, cfg.head_dim), dtype, -bound, bound)
        if cfg.positionwise == "conv1d-linear":
            from .layers import conv1d_init

            kc = jax.random.split(ks[7], 3)
            kk = cfg.positionwise_conv_kernel
            p["ffn_dw"] = conv1d_init(kc[0], d, d, kk, groups=d, dtype=dtype)
            p["ffn_pw"] = conv1d_init(kc[1], d, cfg.linear_units, 1, dtype=dtype)
            p["ffn2"] = linear_init(kc[2], cfg.linear_units, d, dtype=dtype)
        elif cfg.positionwise == "conv1d":
            from .layers import conv1d_init

            kc = jax.random.split(ks[7], 2)
            kk = cfg.positionwise_conv_kernel
            p["ffn_c1"] = conv1d_init(kc[0], d, cfg.linear_units, kk, dtype=dtype)
            p["ffn_c2"] = conv1d_init(kc[1], cfg.linear_units, d, kk, dtype=dtype)
        else:
            p["ffn1"] = linear_init(ks[7], d, cfg.linear_units, dtype=dtype)
            p["ffn2"] = linear_init(jax.random.fold_in(ks[7], 1),
                                    cfg.linear_units, d, dtype=dtype)
        return p

    blocks = [block_init(keys[8 + i]) for i in range(cfg.num_blocks)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "sub": sub,
        "embed": embed,
        "blocks": stacked,
        "after_norm": layer_norm_init(d, dtype),
        "cmvn": {"mean": jnp.zeros((cfg.input_dim,), dtype),
                 "istd": jnp.ones((cfg.input_dim,), dtype)},
    }


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def subsampled_len(t_in: int) -> int:
    """Frames out of Conv2dSubsampling4 for t_in fbank frames (two stride-2
    valid 3x3 convs)."""
    return ((t_in - 1) // 2 - 1) // 2


def _subsample(params, x):
    """Conv2dSubsampling4 (subsampling.py:15-73). x: [B, T, F] -> [B, T', d]."""
    x = x[:, None, :, :]  # [B, 1, T, F]
    x = jax.nn.relu(conv2d(params["conv1"], x, stride=2))
    x = jax.nn.relu(conv2d(params["conv2"], x, stride=2))
    b, c, t, f = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, c * f)
    return linear(params["out"], x)


def _embed(params, x):
    """input_layer='linear': Linear + LN + ReLU (transformer.py:186-192)."""
    return jax.nn.relu(layer_norm(params["ln"], linear(params["lin"], x)))


def _rel_attention(bp, x_q, k_all, v_all, pos_emb, mask, cfg: EncoderConfig):
    """MHA over an explicit key buffer; relative-position (Transformer-XL
    u/v biases, rel_shift dropped — attention.py:370-390) for 'rel-enc',
    plain scaled dot-product (attention.py:392-393) for 'abs-enc' (where the
    PE was already added to the block inputs).

    x_q: [B, T, d]; k_all/v_all: [B, S, H, dk]; pos_emb: [S, d] (shared) or
    [B, S, d] (per-batch streaming positions), ignored for abs-enc;
    mask: [B, 1, T, S] or None. Returns [B, T, d]."""
    B, T, d = x_q.shape
    H, dk = cfg.attention_heads, cfg.head_dim
    q = linear(bp["q"], x_q).reshape(B, T, H, dk)

    if cfg.pos_enc == "abs-enc":
        scores = jnp.einsum("bthd,bshd->bhts", q, k_all) / math.sqrt(dk)
        attn = masked_softmax(scores, mask)
        out = jnp.einsum("bhts,bshd->bthd", attn, v_all).reshape(B, T, d)
        return linear(bp["o"], out)

    ac = jnp.einsum("bthd,bshd->bhts", q + bp["bias_u"], k_all)
    if pos_emb.ndim == 2:
        p = linear(bp["pos"], pos_emb).reshape(-1, H, dk)  # [S, H, dk]
        bd = jnp.einsum("bthd,shd->bhts", q + bp["bias_v"], p)
    else:
        p = linear(bp["pos"], pos_emb).reshape(B, -1, H, dk)  # [B, S, H, dk]
        bd = jnp.einsum("bthd,bshd->bhts", q + bp["bias_v"], p)
    scores = (ac + bd) / math.sqrt(dk)
    attn = masked_softmax(scores, mask)
    out = jnp.einsum("bhts,bshd->bthd", attn, v_all).reshape(B, T, d)
    return linear(bp["o"], out)


def _ffn(bp, x, cfg: EncoderConfig, cache=None):
    """Positionwise FFN variants (attention.py:123-266):
    'linear': w2(relu(w1 x));
    'conv1d' (MultiLayeredConv1d): two symmetric-padded convs — batch only,
    like the reference (no streaming infer exists for it);
    'conv1d-linear' (Conv1dLinear): depthwise+pointwise causal conv then
    linear, with a left-context cache in streaming. Returns (y, new_cache)."""
    from .layers import conv1d

    if cfg.positionwise == "conv1d":
        k = cfg.positionwise_conv_kernel
        pad = ((k - 1) // 2,) * 2
        xc = jnp.swapaxes(x, 1, 2)
        y = jax.nn.relu(conv1d(bp["ffn_c1"], xc, padding=pad))
        y = conv1d(bp["ffn_c2"], y, padding=pad)
        return jnp.swapaxes(y, 1, 2), cache
    if cfg.positionwise != "conv1d-linear":
        return linear(bp["ffn2"], jax.nn.relu(linear(bp["ffn1"], x))), cache

    k = cfg.positionwise_conv_kernel
    d = x.shape[-1]
    xc = jnp.swapaxes(x, 1, 2)  # [B, d, T]
    if cache is None:
        xc = jnp.pad(xc, ((0, 0), (0, 0), (k - 1, 0)))
        new_cache = None
    else:
        xc = jnp.concatenate([cache, xc], axis=2)
        new_cache = xc[:, :, xc.shape[2] - (k - 1):]
    y = conv1d(bp["ffn_dw"], xc, groups=d)
    y = conv1d(bp["ffn_pw"], y)
    y = jax.nn.relu(jnp.swapaxes(y, 1, 2))
    return linear(bp["ffn2"], y), new_cache


# ---------------------------------------------------------------------------
# batch (training / full-utterance) forward
# ---------------------------------------------------------------------------


def chunk_causal_mask(size: int, chunk_size: int, left_chunks: int) -> jnp.ndarray:
    """wenet-style subsequent_chunk_mask (models/masks.py:59-123): position i
    attends to [max(0, (i//cs - left)*cs), ((i//cs)+1)*cs)."""
    idx = jnp.arange(size)
    chunk_of = idx // chunk_size
    lo = jnp.maximum((chunk_of - left_chunks) * chunk_size, 0)
    hi = (chunk_of + 1) * chunk_size
    j = idx[None, :]
    return (j >= lo[:, None]) & (j < hi[:, None])  # [T, T]


def forward(params, cfg: EncoderConfig, xs: jnp.ndarray,
            mask: Optional[jnp.ndarray] = None,
            apply_cmvn: bool = True) -> jnp.ndarray:
    """Full-sequence forward (parity with speechEncoder.forward semantics for
    static chunk masks). xs: [B, T_in, F] raw fbank. Returns [B, T', d]."""
    xs = xs.astype(params["cmvn"]["mean"].dtype)
    if apply_cmvn:
        xs = (xs - params["cmvn"]["mean"]) * params["cmvn"]["istd"]
    x = _subsample(params["sub"], xs)
    x = _embed(params["embed"], x)
    x = x * math.sqrt(cfg.attention_dim)
    T = x.shape[1]
    pos_emb = sinusoidal_pe(jnp.arange(T), cfg.attention_dim).astype(x.dtype)
    if cfg.pos_enc == "abs-enc":
        # PositionalEncoding.forward: x = x*xscale + pe[:T] (attention.py:36-52)
        x = x + pos_emb[None]
    if mask is None:
        mask = chunk_causal_mask(T, cfg.chunk_size, cfg.left_chunks)
    mask = mask[None, None] if mask.ndim == 2 else mask

    H, dk = cfg.attention_heads, cfg.head_dim

    def block_fn(x, bp):
        B = x.shape[0]
        h = layer_norm(bp["ln1"], x)
        k = linear(bp["k"], h).reshape(B, T, H, dk)
        v = linear(bp["v"], h).reshape(B, T, H, dk)
        x = x + _rel_attention(bp, h, k, v, pos_emb, mask, cfg)
        y, _ = _ffn(bp, layer_norm(bp["ln2"], x), cfg)
        x = x + y
        return x, None

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    return layer_norm(params["after_norm"], x)


# ---------------------------------------------------------------------------
# streaming step
# ---------------------------------------------------------------------------


def stream_step(params, cfg: EncoderConfig, xs: jnp.ndarray,
                state: EncoderState) -> Tuple[jnp.ndarray, EncoderState]:
    """One streaming chunk. xs: [B, T_in, F] fbank window (e.g. 19 or 32
    frames); returns ([B, T, d], new state) with T = ((T_in-1)//2 - 1)//2.

    Matches speechEncoder.infer -> Transformer.infer -> MultiHeadedAttention.infer
    (encoder.py:149-155, transformer.py:266-285, attention.py:407-459): queries
    attend over cached-window + current chunk with *no* intra-chunk causal mask;
    the cache then retains the most recent `window` keys. valid/pe_index are
    per-batch so sessions at different lifetimes batch together.

    Compute dtype follows the params (audio_llm.cast_frontend): an f32 input
    chunk must not promote a bf16 tree back to f32 matmuls."""
    xs = xs.astype(params["cmvn"]["mean"].dtype)
    xs = (xs - params["cmvn"]["mean"]) * params["cmvn"]["istd"]
    x = _subsample(params["sub"], xs)
    x = _embed(params["embed"], x)
    x = x * math.sqrt(cfg.attention_dim)

    B, T, d = x.shape
    cap = cfg.window
    S = cap + T

    valid = jnp.minimum(state.valid, cap)                         # [B]
    slot = jnp.arange(S)[None, :]                                 # [1, S]
    if cfg.pos_enc == "abs-enc":
        # Absolute PE added to the chunk inputs at their utterance positions.
        # The reference's streaming path would crash here (PositionalEncoding
        # has no .infer, transformer.py:278) — this is the natural extension:
        # pe_index counts emitted post-subsampling frames, wrapping at
        # pe_max_len to stay inside the reference's asserted table bound.
        pe_idx = jnp.mod(state.pe_index, cfg.pe_max_len)          # [B]
        positions = pe_idx[:, None] + jnp.arange(T)[None, :]      # [B, T]
        x = x + sinusoidal_pe(positions.reshape(-1), d
                              ).reshape(B, T, d).astype(x.dtype)
        pos_emb = jnp.zeros((1, S, d), x.dtype)  # unused in abs attention
        pe_next = pe_idx + T
    else:
        # --- streaming rel-PE (attention.py:105-121), per batch ---
        pe_idx = jnp.mod(state.pe_index, cfg.pe_wrap)             # [B]
        start = jnp.maximum(0, pe_idx - cfg.full_chunk_size)      # [B]
        # slot s holds key number j = s - (cap - valid); position is start + j
        positions = start[:, None] + slot - (cap - valid)[:, None]  # [B, S]
        # PE in the compute dtype: an f32 table would upcast the bf16
        # attention path (and break the layer-scan carry dtype)
        pos_emb = sinusoidal_pe(positions.reshape(-1), d
                                ).reshape(B, S, d).astype(x.dtype)
        pe_next = pe_idx + cfg.chunk_size
    keep = slot >= (cap - valid)[:, None]                         # [B, S]
    mask = keep[:, None, None, :]                                 # [B, H, T, S]

    H, dk = cfg.attention_heads, cfg.head_dim

    def block_fn(x, inputs):
        bp, k_cache, v_cache, f_cache = inputs  # kv caches: [B, cap, H, dk]
        h = layer_norm(bp["ln1"], x)
        k_new = linear(bp["k"], h).reshape(B, T, H, dk)
        v_new = linear(bp["v"], h).reshape(B, T, H, dk)
        k_all = jnp.concatenate([k_cache, k_new], axis=1)  # [B, S, H, dk]
        v_all = jnp.concatenate([v_cache, v_new], axis=1)
        x = x + _rel_attention(bp, h, k_all, v_all, pos_emb, mask, cfg)
        y, f_cache = _ffn(bp, layer_norm(bp["ln2"], x), cfg,
                          cache=f_cache if cfg.positionwise == "conv1d-linear"
                          else None)
        x = x + y
        if f_cache is None:
            f_cache = inputs[3]
        # static shift+append: keep the newest `cap` keys, still time-ordered
        return x, (k_all[:, -cap:], v_all[:, -cap:], f_cache)

    x, (new_k, new_v, new_f) = jax.lax.scan(
        block_fn, x, (params["blocks"], state.k_cache, state.v_cache,
                      state.ffn_cache))
    x = layer_norm(params["after_norm"], x)

    new_state = EncoderState(
        k_cache=new_k, v_cache=new_v,
        valid=jnp.minimum(valid + T, cap).astype(jnp.int32),
        pe_index=pe_next.astype(jnp.int32),
        ffn_cache=new_f,
    )
    return x, new_state
