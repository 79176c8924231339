"""Sequence (context) parallelism: ring attention over a 'seq' mesh axis.

Long-sequence training/prefill forward where activations are sharded along
TIME: each device holds a contiguous T/R slice of the sequence; KV blocks
rotate around the ring with `ppermute` while every device accumulates its
queries' attention with an online softmax — peak activation memory per device
drops by the ring size and the collectives ride ICI neighbor links.

The reference's only long-context strategy is windowing + session resets
(SURVEY.md §5); this provides true SP for the frozen-LLM forward, composing
with DP ('data') and TP ('model') axes. Exact-match tested against the
unsharded causal forward.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import LLMConfig
from ..models.layers import NEG_INF, linear, rms_norm, rotary_embed


def ring_attention(q, k, v, q_pos, kv_pos0, rep: int, seq_axis: str, R: int):
    """Online-softmax ring attention (causal). Shapes as in _ring_attention.
    Runs inside shard_map; R ppermute rounds."""
    B, Tl, H, dk = q.shape
    Hkv = k.shape[2]
    qg = q.reshape(B, Tl, Hkv, rep, dk).astype(jnp.float32)
    scale = 1.0 / math.sqrt(dk)
    perm = [(i, (i + 1) % R) for i in range(R)]

    vary = lambda x: jax.lax.pcast(x, (seq_axis,), to="varying")
    m = vary(jnp.full((B, Hkv, rep, Tl, 1), NEG_INF, jnp.float32))
    l = vary(jnp.zeros((B, Hkv, rep, Tl, 1), jnp.float32))
    acc = vary(jnp.zeros((B, Hkv, rep, Tl, dk), jnp.float32))

    def body(carry, _):
        kb, vb, pos0, m, l, acc = carry
        s = jnp.einsum("bthrd,bshd->bhrts", qg,
                       kb.astype(jnp.float32)) * scale
        kpos = pos0 + jnp.arange(Tl)
        causal = q_pos[:, None] >= kpos[None, :]
        s = jnp.where(causal[None, None, None], s, NEG_INF)
        bm = jnp.max(s, axis=-1, keepdims=True)
        m2 = jnp.maximum(m, bm)
        corr = jnp.exp(m - m2)
        p = jnp.exp(s - m2)
        l2 = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhrts,bshd->bhrtd", p, vb.astype(jnp.float32))
        acc2 = acc * corr + pv
        # rotate the KV block (and its start position) around the ring
        kb = jax.lax.ppermute(kb, seq_axis, perm)
        vb = jax.lax.ppermute(vb, seq_axis, perm)
        pos0 = jax.lax.ppermute(pos0, seq_axis, perm)
        return (kb, vb, pos0, m2, l2, acc2), None

    (kb, vb, pos0, m, l, acc), _ = jax.lax.scan(
        body, (k, v, kv_pos0, m, l, acc), None, length=R)
    out = acc / jnp.maximum(l, 1e-30)                     # [B,Hkv,rep,Tl,dk]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Tl, H, dk)


def sp_forward(params: dict, cfg: LLMConfig, embeds: jnp.ndarray, mesh: Mesh,
               seq_axis: str = "seq") -> jnp.ndarray:
    """Sequence-parallel causal forward. embeds: [B, T, D] with T divisible by
    the seq-axis size. Returns final-norm hidden [B, T, D] identical to the
    unsharded forward."""
    B, T, D = embeds.shape
    R = mesh.shape[seq_axis]
    assert T % R == 0, (T, R)
    Tl = T // R
    H, Hkv, dk = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = H // Hkv

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, seq_axis, None)),
        out_specs=P(None, seq_axis, None),
    )
    def run(layers_and_norm, x_local):  # x_local: [B, Tl, D]
        layers, final_norm = layers_and_norm
        idx = jax.lax.axis_index(seq_axis)
        q_pos = idx * Tl + jnp.arange(Tl)
        cos, sin = rotary_embed(q_pos, dk, cfg.rope_theta)

        def rot(t):
            d2 = t.shape[-1] // 2
            r = jnp.concatenate([-t[..., d2:], t[..., :d2]], axis=-1)
            return (t * cos[None, :, None, :]
                    + r * sin[None, :, None, :]).astype(t.dtype)

        def layer_fn(x, lp):
            h = rms_norm(lp["ln1"], x, cfg.rms_eps)
            q = rot(linear(lp["q"], h).reshape(B, Tl, H, dk))
            k = rot(linear(lp["k"], h).reshape(B, Tl, Hkv, dk))
            v = linear(lp["v"], h).reshape(B, Tl, Hkv, dk)
            att = ring_attention(q, k, v, q_pos, idx * Tl, rep, seq_axis, R)
            x = x + linear(lp["o"], att.reshape(B, Tl, H * dk).astype(x.dtype))
            h2 = rms_norm(lp["ln2"], x, cfg.rms_eps)
            x = x + linear(lp["down"], jax.nn.silu(linear(lp["gate"], h2))
                           * linear(lp["up"], h2))
            return x, None

        x, _ = jax.lax.scan(layer_fn, x_local, layers)
        return rms_norm(final_norm, x, cfg.rms_eps)

    return run((params["layers"], params["final_norm"]), embeds)
