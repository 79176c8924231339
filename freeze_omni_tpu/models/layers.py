"""Shared functional NN building blocks (plain pytrees, no module framework).

Parameters are nested dicts of jnp arrays; every forward is a pure function so
it can be jitted/vmapped/scanned and sharded with pjit. Initializers follow
torch defaults (kaiming-uniform for linear/conv, as in the reference modules)
so randomly-initialized parity tests exercise realistic scales.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Linear default init. Weight stored as [in, out]."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": _uniform(kw, (in_dim, out_dim), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_dim,), bound, dtype)
    return p


# XLA fuses the int8->bf16 dequant into the matmul and, with stacked weights
# scanned over layers, the dequant is loop-variant so nothing is hoisted:
# measured 10.8 ms/token vs 16.6 through the Pallas kernel for 28-layer 7B
# decode on one v5e. The Pallas path stays available for A/B.
QUANT_USE_PALLAS = False


def linear(p, x):
    if "w_q4" in p:
        # int4 weight-only (ops/quant.quantize_linear_int4). On TPU the
        # Pallas kernel keeps weights packed into VMEM (XLA does NOT fuse
        # the nibble unpack — measured 173 ms/token vs the kernel's
        # HBM-bound path); elsewhere fall back to the XLA dequant.
        if jax.default_backend() == "tpu" and p["w_q4"].ndim == 2:
            from ..ops.quant_matmul import pick_block_o, quant_matmul4

            Kp, O = p["w_q4"].shape
            group = (2 * Kp) // p["scale4"].shape[-2]
            lead = x.shape[:-1]
            y = quant_matmul4(x.reshape(-1, 2 * Kp), p["w_q4"], p["scale4"],
                              group=group,
                              block_o=pick_block_o(O)).reshape(*lead, O)
        else:
            from ..ops.quant import dequantize_weight_int4

            w = dequantize_weight_int4(p, dtype=x.dtype)
            y = jnp.einsum("...i,io->...o", x, w)
    elif "w_q" in p:
        # weight-only int8 (ops/quant.py)
        if (QUANT_USE_PALLAS and jax.default_backend() == "tpu"
                and p["w_q"].ndim == 2):
            from ..ops.quant_matmul import pick_blocks, quant_matmul

            K, O = p["w_q"].shape
            bk, bo = pick_blocks(K, O)
            lead = x.shape[:-1]
            y = quant_matmul(x.reshape(-1, K), p["w_q"], p["scale"],
                             block_k=bk, block_o=bo).reshape(*lead, O)
        else:
            w = (p["w_q"].astype(x.dtype)
                 * p["scale"].astype(x.dtype)[..., None, :])
            y = jnp.einsum("...i,io->...o", x, w)
    else:
        y = jnp.einsum("...i,io->...o", x, p["w"])
    if "b" in p:
        # keep the activation dtype: an f32 bias must not upcast a bf16
        # activation (it would flip the qwen2 layer-scan carry dtype)
        y = y + p["b"].astype(y.dtype)
    return y


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def rms_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p, x, eps: float = 1e-6):
    dt = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    # scale in the activation dtype: an f32 scale must not upcast a bf16
    # activation (dtype-stable layer-scan carries)
    return (x * jax.lax.rsqrt(var + eps)).astype(dt) * p["scale"].astype(dt)


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int, groups: int = 1,
                bias: bool = True, dtype=jnp.float32):
    """torch.nn.Conv1d default init. Weight [out, in//groups, k]."""
    kw, kb = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(kw, (out_ch, in_ch // groups, kernel), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), bound, dtype)
    return p


def conv1d(p, x, stride: int = 1, padding=(0, 0), groups: int = 1,
           dilation: int = 1):
    """x: [B, C, T] (NCW)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=[padding],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def conv_transpose1d(p, x, stride: int, padding: int):
    """x: [B, C, T]; p['w']: [in, out, k] (torch ConvTranspose1d layout).

    Expressed as a fractionally-strided conv (lhs_dilation) with a flipped
    kernel — verified exact against torch ConvTranspose1d."""
    w = p["w"]
    k = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w[:, :, ::-1], window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "IOH", "NCH"),
    )
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def conv_transpose1d_init(key, in_ch: int, out_ch: int, kernel: int,
                          bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = out_ch * kernel  # torch uses in_channels*k of the transposed view
    bound = 1.0 / math.sqrt(in_ch * kernel)
    p = {"w": _uniform(kw, (in_ch, out_ch, kernel), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), bound, dtype)
    return p


def conv2d_init(key, in_ch: int, out_ch: int, kernel: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": _uniform(kw, (out_ch, in_ch, kernel, kernel), bound, dtype),
        "b": _uniform(kb, (out_ch,), bound, dtype),
    }


def conv2d(p, x, stride: int):
    """x: [B, C, H, W]."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def batch_norm_init(dim: int, dtype=jnp.float32):
    return {
        "scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype),
        "mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype),
    }


def batch_norm_eval(p, x, eps: float, channel_axis: int):
    """Inference-mode batchnorm using running stats."""
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    scale = p["scale"].reshape(shape)
    bias = p["bias"].reshape(shape)
    mean = p["mean"].reshape(shape)
    var = p["var"].reshape(shape)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def embedding_init(key, vocab: int, dim: int, dtype=jnp.float32):
    return {"w": jax.random.normal(key, (vocab, dim), dtype)}


def embedding(p, ids):
    return jnp.take(p["w"], ids, axis=0)


def sinusoidal_pe(positions: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """Interleaved sin/cos positional encoding rows for given positions.

    Matches the reference layout pe[:, 0::2]=sin, pe[:, 1::2]=cos
    (models/encoder/attention.py:27-35, 110-118)."""
    half = d_model // 2
    inv = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * -(math.log(10000.0) / d_model))
    ang = positions.astype(jnp.float32)[:, None] * inv[None, :]
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [P, half, 2]
    return pe.reshape(positions.shape[0], d_model)


NEG_INF = -1e9


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over last axis with a boolean keep-mask (True = attend)."""
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    out = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out


def rotary_embed(positions: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin tables [T, head_dim] in the HF Llama/Qwen half-rotated layout."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * jnp.asarray(inv)[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, D]; cos/sin: [T, D] (HF rotate-half convention)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, :, None, :] + rotated * sin[None, :, None, :]
