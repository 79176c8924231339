"""Pipeline parallelism for the LLM backbone (GPipe schedule over ICI).

The reference has no model parallelism of any kind (SURVEY.md §2.3). Tensor
parallelism (parallel/mesh.py) covers intra-layer scaling; this module adds
inter-layer scaling: the layer stack is split into contiguous stages along a
'stage' mesh axis, activations flow stage-to-stage with
`jax.lax.ppermute` inside `shard_map`, and microbatching fills the pipeline
(schedule length = num_microbatches + num_stages - 1). Useful when one chip
cannot hold the full depth (the exact situation on the 16 GB v5e, see
STATUS.md) and composes with DP on a second axis.

Implements the full-sequence causal forward (training / prefill); returns the
same hidden states as models/qwen2.forward on a fresh cache.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LLMConfig
from ..models.layers import NEG_INF, linear, rms_norm, rotary_embed


def _stage_forward(layers_local, cfg: LLMConfig, x, cos, sin, mask):
    """Run this stage's contiguous layer block. x: [b, T, D]."""
    B, T, D = x.shape
    H, Hkv, dk = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = H // Hkv

    def rot(t):
        d2 = t.shape[-1] // 2
        r = jnp.concatenate([-t[..., d2:], t[..., :d2]], axis=-1)
        return (t * cos[None, :, None, :] + r * sin[None, :, None, :]).astype(t.dtype)

    def layer_fn(x, lp):
        h = rms_norm(lp["ln1"], x, cfg.rms_eps)
        q = rot(linear(lp["q"], h).reshape(B, T, H, dk))
        k = rot(linear(lp["k"], h).reshape(B, T, Hkv, dk))
        v = linear(lp["v"], h).reshape(B, T, Hkv, dk)
        qg = q.reshape(B, T, Hkv, rep, dk)
        s = jnp.einsum("bthrd,bshd->bhrts", qg, k) / math.sqrt(dk)
        s = jnp.where(mask[None, None, None], s, NEG_INF)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhrts,bshd->bthrd", p, v).reshape(B, T, H * dk)
        x = x + linear(lp["o"], o)
        h2 = rms_norm(lp["ln2"], x, cfg.rms_eps)
        x = x + linear(lp["down"],
                       jax.nn.silu(linear(lp["gate"], h2)) * linear(lp["up"], h2))
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, layers_local)
    return x


def pp_forward(params: dict, cfg: LLMConfig, embeds: jnp.ndarray, mesh: Mesh,
               num_microbatches: int, stage_axis: str = "stage") -> jnp.ndarray:
    """GPipe forward. embeds: [B, T, D]; B % num_microbatches == 0; the layer
    count must divide by the stage-axis size. Returns final-norm hidden
    [B, T, D] (identical to the unsharded forward)."""
    B, T, D = embeds.shape
    M = num_microbatches
    assert B % M == 0, (B, M)
    P_stages = mesh.shape[stage_axis]
    assert cfg.num_layers % P_stages == 0, (cfg.num_layers, P_stages)
    b = B // M

    dk = cfg.head_dim
    cosT, sinT = rotary_embed(jnp.arange(T), dk, cfg.rope_theta)
    causal = jnp.tril(jnp.ones((T, T), bool))

    # split the stacked layers along the stage axis; everything else replicated
    layer_sharding = jax.tree.map(
        lambda _: P(stage_axis), params["layers"],
        is_leaf=lambda x: hasattr(x, "shape"))

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(layer_sharding, P()),
        out_specs=P(),
    )
    def run(layers_local, micro):  # micro: [M, b, T, D] replicated
        stage = jax.lax.axis_index(stage_axis)
        nsteps = M + P_stages - 1
        perm = [(i, i + 1) for i in range(P_stages - 1)]

        def step(carry, t):
            recv, outputs = carry
            mb = t - stage  # microbatch index this stage works on
            active = (mb >= 0) & (mb < M)
            x_in = jnp.where(stage == 0,
                             micro[jnp.clip(mb, 0, M - 1)], recv)
            y = _stage_forward(layers_local, cfg, x_in, cosT, sinT, causal)
            y = jnp.where(active, y, recv)
            # last stage records its finished microbatch (branch-free: cond
            # output types differ under shard_map's varying-axis tracking)
            idx = jnp.clip(mb, 0, M - 1)
            write = active & (stage == P_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, idx, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, y, cur), idx, 0)
            sent = jax.lax.ppermute(y, stage_axis, perm)
            return (sent, outputs), None

        recv0 = jax.lax.pcast(jnp.zeros((b, T, D), embeds.dtype),
                              (stage_axis,), to="varying")
        out0 = jax.lax.pcast(jnp.zeros((M, b, T, D), embeds.dtype),
                             (stage_axis,), to="varying")
        (_, outputs), _ = jax.lax.scan(
            step, (recv0, out0), jnp.arange(nsteps))
        # broadcast the last stage's outputs to every device
        outputs = jax.lax.psum(
            jnp.where(stage == P_stages - 1, outputs, 0.0), stage_axis)
        return outputs

    micro = embeds.reshape(M, b, T, D)
    out = run(params["layers"], micro)
    hidden = out.reshape(B, T, D)
    return rms_norm(params["final_norm"], hidden, cfg.rms_eps)
