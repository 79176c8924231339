"""TiCodec VQ-VAE codec, TPU-native.

Functional re-design of models/decoder/ticodec/{models.py,vqvae.py}:

- `decode`: grouped/residual VQ embedding lookup + global-style-token embedding
  -> HiFiGAN-style generator (ConvTranspose upsampling x MRF resblocks, global
  feature injection at the matching channel depth) -> waveform
  (vqvae.py:37-42, models.py:169-242). This is the serving hot path: all convs
  are XLA `conv_general_dilated` in NCW layout, jit-compiled per token-chunk
  shape, weight-norm folded (inference uses remove_weight_norm, llm2tts.py:28-29).
- `encode`: mirrored conv encoder with GroupNorm + mid-depth global-token
  branch, then nearest-neighbour quantization (models.py:429-514, 540-615),
  for codec round-trip tests and data prep.

Upsample product = 600: 40 Hz tokens -> 24 kHz audio (llm2tts.py:132).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CodecConfig
from .layers import (batch_norm_eval, batch_norm_init, conv1d, conv1d_init,
                     conv_transpose1d, conv_transpose1d_init, embedding, linear,
                     linear_init)

LRELU_SLOPE = 0.1


def _lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def _get_padding(kernel: int, dilation: int = 1) -> int:
    return (kernel * dilation - dilation) // 2


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _resblock1_init(key, channels: int, kernel: int, dilations) -> dict:
    ks = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [conv1d_init(ks[i], channels, channels, kernel)
                   for i in range(len(dilations))],
        "convs2": [conv1d_init(ks[len(dilations) + i], channels, channels, kernel)
                   for i in range(len(dilations))],
    }


def init_params(key, cfg: CodecConfig, with_encoder: bool = False,
                dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 16)
    uic = cfg.upsample_initial_channel
    nk = len(cfg.resblock_kernel_sizes)

    # generator
    ups, resblocks = [], []
    kup = jax.random.split(ks[0], len(cfg.upsample_rates))
    krb = jax.random.split(ks[1], len(cfg.upsample_rates) * nk)
    ch = uic
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ups.append(conv_transpose1d_init(kup[i], uic // (2 ** i), uic // (2 ** (i + 1)), k))
        ch = uic // (2 ** (i + 1))
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            resblocks.append(_resblock1_init(krb[i * nk + j], ch, rk, rd))

    gen = {
        "conv_pre": conv1d_init(ks[2], 512, uic, 7),
        "ups": ups,
        "resblocks": resblocks,
        "conv_post": conv1d_init(ks[3], ch, 1, 7),
    }

    # quantizer codebooks
    group_dim = 512 // cfg.n_code_groups
    kq = jax.random.split(ks[4], cfg.residual_layers)
    codebooks = [
        jnp.stack([jax.random.uniform(k2, (cfg.n_codes, group_dim), dtype,
                                      -1.0 / cfg.n_codes, 1.0 / cfg.n_codes)
                   for k2 in jax.random.split(kq[r], cfg.n_code_groups)])
        for r in range(cfg.residual_layers)
    ]  # list of [G, n_codes, group_dim]
    g_dim = cfg.global_feature_dim // cfg.global_code_num
    gst = jnp.stack([jax.random.uniform(k2, (cfg.n_codes, g_dim), dtype,
                                        -1.0 / cfg.n_codes, 1.0 / cfg.n_codes)
                     for k2 in jax.random.split(ks[5], cfg.global_code_num)])

    params = {"generator": gen,
              "quantizer": {"codebooks": codebooks, "gst": gst}}

    if with_encoder:
        kup2 = jax.random.split(ks[6], len(cfg.upsample_rates))
        krb2 = jax.random.split(ks[7], len(cfg.upsample_rates) * nk)
        eups, erbs, norms = [], [], []
        rev = list(reversed(list(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes))))
        for i, (u, k) in enumerate(rev):
            eups.append(conv1d_init(kup2[i], 32 * (2 ** i), 32 * (2 ** (i + 1)), k))
            ch_e = 32 * (2 ** (i + 1))
            for j, (rk, rd) in enumerate(zip(reversed(cfg.resblock_kernel_sizes),
                                             reversed(cfg.resblock_dilation_sizes))):
                erbs.append(_resblock1_init(krb2[i * nk + j], ch_e, rk, rd))
                norms.append({"ch": ch_e})
        gfc = cfg.global_feature_conv
        kg = jax.random.split(ks[8], 4)
        params["encoder"] = {
            "conv_pre": conv1d_init(ks[9], 1, 32, 7),
            "ups": eups,
            "resblocks": erbs,
            "group_norms": [
                {"scale": jnp.ones((n["ch"],), dtype),
                 "bias": jnp.zeros((n["ch"],), dtype)}
                for n in norms],
            "conv_post": conv1d_init(ks[10], 512, 512, 3),
            "gte": {
                "conv1": conv1d_init(kg[0], gfc[0], gfc[1], gfc[3], bias=False),
                "conv2": conv1d_init(kg[1], gfc[1], gfc[1], gfc[3], bias=False),
                "conv3": conv1d_init(kg[2], gfc[1], gfc[2], gfc[3], bias=False),
                "fn": linear_init(kg[3], gfc[2], gfc[2]),
                "bn": batch_norm_init(gfc[2], dtype),
            },
        }
    return params


# ---------------------------------------------------------------------------
# quantizer
# ---------------------------------------------------------------------------


def quantizer_embed(params, cfg: CodecConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes: [B, T, Nq] with Nq = residual_layers * n_code_groups ->
    [B, 512, T] (Quantizer.embed, models.py:661-702)."""
    out = 0.0
    G = cfg.n_code_groups
    for r in range(cfg.residual_layers):
        groups = [embedding({"w": params["codebooks"][r][g]}, codes[:, :, r * G + g])
                  for g in range(G)]
        out = out + jnp.concatenate(groups, axis=-1)  # [B, T, 512]
    return jnp.swapaxes(out, 1, 2)


def quantizer_embed_gst(params, cfg: CodecConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens: [B, 1, G] -> [B, global_feature_dim] (embed_gst, models.py:703-715)."""
    groups = [embedding({"w": params["gst"][g]}, tokens[:, 0, g])
              for g in range(cfg.global_code_num)]
    return jnp.concatenate(groups, axis=-1)


def _nearest(codebook: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """codebook [n, d], x [N, d] -> indices [N]."""
    d = (jnp.sum(x ** 2, 1, keepdims=True) + jnp.sum(codebook ** 2, 1)
         - 2.0 * x @ codebook.T)
    return jnp.argmin(d, axis=1)


def quantize(params, cfg: CodecConfig, features: jnp.ndarray,
             global_features: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """features [B, 512, T], global [B, 128] -> (codes [B, T, Nq], gst [B, 1, G])."""
    B, C, T = features.shape
    G = cfg.n_code_groups
    gd = C // G
    residual = jnp.swapaxes(features, 1, 2).reshape(-1, C)  # [B*T, 512]
    all_codes = []
    for r in range(cfg.residual_layers):
        qs, idxs = [], []
        for g in range(G):
            cb = params["codebooks"][r][g]
            idx = _nearest(cb, residual[:, g * gd : (g + 1) * gd])
            idxs.append(idx)
            qs.append(cb[idx])
        q = jnp.concatenate(qs, axis=-1)
        residual = residual - q
        all_codes.extend(idxs)
    codes = jnp.stack(all_codes, -1).reshape(B, T, -1)

    ggd = cfg.global_feature_dim // cfg.global_code_num
    gidx = [_nearest(params["gst"][g], global_features[:, g * ggd : (g + 1) * ggd])
            for g in range(cfg.global_code_num)]
    gst = jnp.stack(gidx, -1)[:, None, :]
    return codes, gst


# ---------------------------------------------------------------------------
# generator (decode)
# ---------------------------------------------------------------------------


def _resblock1(p, x, dilations, kernel: int):
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = conv1d(c1, _lrelu(x), padding=(_get_padding(kernel, d),) * 2, dilation=d)
        xt = conv1d(c2, _lrelu(xt), padding=(_get_padding(kernel, 1),) * 2)
        x = xt + x
    return x


def generate(params, cfg: CodecConfig, quant: jnp.ndarray,
             global_emb: jnp.ndarray) -> jnp.ndarray:
    """quant: [B, 512, T]; global_emb: [B, 128] -> waveform [B, 1, T*600]
    (Generator.forward, models.py:211-242)."""
    g = params["generator"]
    nk = len(cfg.resblock_kernel_sizes)
    x = conv1d(g["conv_pre"], quant, padding=(3, 3))
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _lrelu(x)
        x = conv_transpose1d(g["ups"][i], x, stride=u, padding=(k - u) // 2)
        xs = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            r = _resblock1(g["resblocks"][i * nk + j], x, rd, rk)
            xs = r if xs is None else xs + r
        x = xs / nk
        if x.shape[1] == global_emb.shape[1]:
            x = x + global_emb[:, :, None]
    x = _lrelu(x)
    x = conv1d(g["conv_post"], x, padding=(3, 3))
    return jnp.tanh(x)


def decode(params, cfg: CodecConfig, codes: jnp.ndarray,
           global_tokens: jnp.ndarray) -> jnp.ndarray:
    """codes: [B, T, Nq] int; global_tokens: [B, 1, G] int -> [B, 1, T*600]
    (VQVAE.forward, vqvae.py:37-42)."""
    quant = quantizer_embed(params["quantizer"], cfg, codes)
    gemb = quantizer_embed_gst(params["quantizer"], cfg, global_tokens)
    return generate(params, cfg, quant, gemb)


# ---------------------------------------------------------------------------
# encoder (encode)
# ---------------------------------------------------------------------------


def _group_norm(p, x, eps: float = 1e-6):
    """x: [B, C, T]; torch GroupNorm(groups, C). The group count is always
    C/16 (models.py:446-447) and is derived from the static channel dim —
    storing it as an int pytree leaf would break jit/grad over the encoder
    params (integer leaves become tracers / are non-differentiable)."""
    B, C, T = x.shape
    g = C // 16
    xg = x.reshape(B, g, C // g * T)
    mean = jnp.mean(xg, axis=-1, keepdims=True)
    var = jnp.var(xg, axis=-1, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(B, C, T)
    return x * p["scale"][None, :, None] + p["bias"][None, :, None]


def _global_token_encoder(p, cfg: CodecConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, gfc0, T] -> [B, gfc2] (models.py:22-57)."""
    gfc = cfg.global_feature_conv
    pad = ((gfc[3] - gfc[4]) // 2,) * 2
    x = _lrelu(conv1d(p["conv1"], x, stride=gfc[4], padding=pad))
    x = _lrelu(conv1d(p["conv2"], x, stride=gfc[4], padding=pad))
    x = _lrelu(conv1d(p["conv3"], x, stride=gfc[4], padding=pad))
    x = jnp.mean(x, axis=2)
    x = _lrelu(linear(p["fn"], x))
    return batch_norm_eval(p["bn"], x, eps=1e-5, channel_axis=1)


def encode_features(params, cfg: CodecConfig, wav: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """wav: [B, 1, n] -> (features [B, 512, n/600], global [B, 128])
    (Encoder.forward, models.py:475-514)."""
    e = params["encoder"]
    nk = len(cfg.resblock_kernel_sizes)
    n_ups = len(cfg.upsample_rates)
    rev = list(reversed(list(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes))))
    x = conv1d(e["conv_pre"], wav, padding=(3, 3))
    global_features = None
    rks = list(reversed(cfg.resblock_kernel_sizes))
    rds = list(reversed(cfg.resblock_dilation_sizes))
    for i, (u, k) in enumerate(rev):
        x = _lrelu(x)
        x = conv1d(e["ups"][i], x, stride=u, padding=((k - u) // 2,) * 2)
        xs = None
        for j in range(nk):
            r = _resblock1(e["resblocks"][i * nk + j], x, rds[j], rks[j])
            r = _group_norm(e["group_norms"][i * nk + j], r)
            xs = r if xs is None else xs + r
        x = xs / nk
        if i == n_ups // 2 - 1:
            global_features = _global_token_encoder(e["gte"], cfg, x)
    x = jax.nn.leaky_relu(x)  # default slope 0.01 (models.py:493 uses F.leaky_relu)
    x = conv1d(e["conv_post"], x, padding=(1, 1))
    return x, global_features


def encode(params, cfg: CodecConfig, wav: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """wav: [B, 1, n] -> (codes [B, T, Nq], global_tokens [B, 1, G])
    (VQVAE.encode, vqvae.py:44-57)."""
    feats, gfeat = encode_features(params, cfg, wav)
    return quantize(params["quantizer"], cfg, feats, gfeat)
