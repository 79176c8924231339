"""CNN subsampling adapter: encoder dim -> LLM embedding dim.

Functional re-design of models/adapter.py:72-157 (`CNNSubsampling`, the variant
the reference instantiates for adpter_type='subsampling'). Two configurations:

- two-stage (enc*4 < llm_dim): conv1d(C->2C, k, s1) + BN + act, then
  conv1d(2C->4C, k, s2) + BN + act, then Linear(4C -> llm_dim)
- one-stage: conv1d(C->2C, k, s2) + norm + act, Linear(2C -> llm_dim)

The stride-2 conv halves the encoder frame rate (adapter.py:91,99), giving the
LLM token rate. Streaming uses an explicit fixed-shape left-context cache of
kernel_size-1 input columns per conv; initializing it to zeros is exactly the
reference's first-call zero left-padding (adapter.py:124-143), so no
first-chunk special case exists.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import AdapterConfig
from .layers import (batch_norm_eval, batch_norm_init, conv1d, conv1d_init,
                     layer_norm, layer_norm_init, linear, linear_init)


class AdapterState(NamedTuple):
    """Left-context columns for each conv (the reference's `cnn_cache`)."""

    c1: Optional[jnp.ndarray]  # [B, C, k-1] input cols of conv1 (two-stage only)
    c2: jnp.ndarray            # [B, C2, k-1] input cols of conv2


def init_state(cfg: AdapterConfig, batch: int = 1, dtype=jnp.float32) -> AdapterState:
    k = cfg.kernel_size - 1
    if cfg.two_stage:
        return AdapterState(
            c1=jnp.zeros((batch, cfg.enc_out_dim, k), dtype),
            c2=jnp.zeros((batch, 2 * cfg.enc_out_dim, k), dtype),
        )
    return AdapterState(c1=None, c2=jnp.zeros((batch, cfg.enc_out_dim, k), dtype))


def init_params(key, cfg: AdapterConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    C = cfg.enc_out_dim
    if cfg.two_stage:
        return {
            "conv1": conv1d_init(ks[0], C, 2 * C, cfg.kernel_size, dtype=dtype),
            "bn1": batch_norm_init(2 * C, dtype),
            "conv2": conv1d_init(ks[1], 2 * C, 4 * C, cfg.kernel_size, dtype=dtype),
            "bn2": batch_norm_init(4 * C, dtype),
            "proj": linear_init(ks[2], 4 * C, cfg.llm_dim, dtype=dtype),
        }
    norm = (batch_norm_init(2 * C, dtype) if cfg.norm == "batch"
            else layer_norm_init(2 * C, dtype))
    return {
        "conv2": conv1d_init(ks[1], C, 2 * C, cfg.kernel_size, dtype=dtype),
        "bn2": norm,
        "proj": linear_init(ks[2], 2 * C, cfg.llm_dim, dtype=dtype),
    }


def out_len(t_enc: int) -> int:
    """LLM embeddings per t_enc encoder frames (the stride-2 conv emits
    ceil(T/2) in streaming — left-context cache, no trailing carry)."""
    return (t_enc + 1) // 2


def _act(cfg: AdapterConfig, x):
    return jax.nn.gelu(x) if cfg.activation == "gelu" else jax.nn.relu(x)


def _norm2(params, cfg: AdapterConfig, x):
    """x: [B, C, T]. BatchNorm eval (eps 1e-3, adapter.py:92) or LayerNorm."""
    if cfg.norm == "batch" or cfg.two_stage:
        return batch_norm_eval(params, x, eps=1e-3, channel_axis=1)
    # layer norm over channels: reference transposes to [B, T, C] (adapter.py:145-149)
    return jnp.swapaxes(layer_norm(params, jnp.swapaxes(x, 1, 2), eps=1e-3), 1, 2)


def step(params, cfg: AdapterConfig, x: jnp.ndarray,
         state: AdapterState) -> Tuple[jnp.ndarray, AdapterState]:
    """Streaming step. x: [B, T, C] encoder frames -> [B, ceil(T/2), llm_dim]."""
    k = cfg.kernel_size
    x = jnp.swapaxes(x, 1, 2)  # [B, C, T]

    if cfg.two_stage:
        full = jnp.concatenate([state.c1, x], axis=2)
        new_c1 = full[:, :, 1 - k :]
        x = _act(cfg, batch_norm_eval(params["bn1"], conv1d(params["conv1"], full),
                                      eps=1e-3, channel_axis=1))
    else:
        new_c1 = None

    full = jnp.concatenate([state.c2, x], axis=2)
    new_c2 = full[:, :, 1 - k :]
    x = _act(cfg, _norm2(params["bn2"], cfg, conv1d(params["conv2"], full, stride=2)))

    x = jnp.swapaxes(x, 1, 2)
    x = linear(params["proj"], x)
    return x, AdapterState(c1=new_c1, c2=new_c2)


def forward(params, cfg: AdapterConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Full-sequence forward (zero left-padding == fresh state). [B,T,C]->[B,T',D]."""
    return step(params, cfg, x, init_state(cfg, x.shape[0], x.dtype))[0]


# ---------------------------------------------------------------------------
# non-streaming adapter variants (adpter_type 'cnn' / 'linear',
# models/adapter.py:10-70) — kept for checkpoint-family completeness;
# the fork instantiates the 'subsampling' variant above.
# ---------------------------------------------------------------------------


def cnn_adapter_init(key, cfg: AdapterConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    C = cfg.enc_out_dim
    return {
        "conv1": conv1d_init(ks[0], C, 2 * C, cfg.kernel_size, dtype=dtype),
        "bn1": batch_norm_init(2 * C, dtype),
        "conv2": conv1d_init(ks[1], 2 * C, 4 * C, cfg.kernel_size, dtype=dtype),
        "bn2": batch_norm_init(4 * C, dtype),
        "proj": linear_init(ks[2], 4 * C, cfg.llm_dim, dtype=dtype),
    }


def cnn_adapter_forward(params, cfg: AdapterConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Two stride-1 causal conv stages, no time reduction. [B,T,C]->[B,T,D]."""
    k = cfg.kernel_size
    x = jnp.swapaxes(x, 1, 2)
    x = jnp.pad(x, ((0, 0), (0, 0), (k - 1, 0)))
    x = jax.nn.relu(batch_norm_eval(params["bn1"], conv1d(params["conv1"], x),
                                    eps=1e-3, channel_axis=1))
    x = jnp.pad(x, ((0, 0), (0, 0), (k - 1, 0)))
    x = jax.nn.relu(batch_norm_eval(params["bn2"], conv1d(params["conv2"], x),
                                    eps=1e-3, channel_axis=1))
    return linear(params["proj"], jnp.swapaxes(x, 1, 2))


def linear_adapter_init(key, cfg: AdapterConfig, dtype=jnp.float32) -> dict:
    return {"proj": linear_init(key, cfg.enc_out_dim, cfg.llm_dim, dtype=dtype)}


def linear_adapter_forward(params, cfg: AdapterConfig, x: jnp.ndarray) -> jnp.ndarray:
    return linear(params["proj"], x)
