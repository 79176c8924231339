"""Training: the Freeze-Omni recipe, TPU-native.

The reference ships training-style forwards but no trainer (SURVEY.md §4): the
encoder has a masked batch forward (models/encoder/encoder.py:104-147), the
AudioLLM computes state predictions against a frozen LLM (the 3-stage
curriculum of the paper: encoder/adapter/state-head train, LLM frozen), and the
speech decoder has a CE training forward with block masks
(models/decoder/decoder.py:190-292). This module provides jittable, mesh-
shardable train steps for both:

- `audio_llm_loss`: fbank -> encoder -> adapter -> frozen-LLM causal forward ->
  4-class state-head CE per chunk (chunk labels as in system.png: 0 continue,
  1 respond, 2 end-without-response).
- `speech_decoder_loss`: pre-NN + main-stack teacher-forced CE over
  [hidden; sos,y] with the reference's visibility structure (hidden block
  bidirectional; tokens causal, attending the hidden block).
- `TrainState.step`: optax adamw on the trainable subset; LLM params are
  donated frozen inputs (no optimizer state, no grads) — DP over 'data',
  TP over 'model' via the shardings in parallel/mesh.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import AudioLLMConfig, SpeechDecoderConfig
from ..models import adapter as adapter_mod
from ..models import audio_llm, qwen2
from ..models import encoder as encoder_mod
from ..models import speech_decoder as sd
from ..models.layers import linear


def audio_llm_loss(trainable, frozen, cfg: AudioLLMConfig,
                   fbank: jnp.ndarray, labels: jnp.ndarray,
                   label_mask: jnp.ndarray) -> jnp.ndarray:
    """trainable: {'encoder_user','adapter_user','predictor'}; frozen: {'llm'}.

    fbank: [B, T_f, 80]; labels: [B, Tc] int (one per LLM chunk position);
    label_mask: [B, Tc] bool. Full-sequence causal forward (training uses the
    batch path, not streaming caches)."""
    enc = encoder_mod.forward(trainable["encoder_user"], cfg.encoder, fbank)
    emb = adapter_mod.forward(trainable["adapter_user"], cfg.adapter, enc)
    B, T, D = emb.shape
    cache = qwen2.init_cache(cfg.llm, B, max_len=T + 1, dtype=emb.dtype)
    hidden, _ = qwen2.forward(frozen["llm"], cfg.llm, emb,
                              jnp.ones((B, T), bool), cache)
    logits = linear(trainable["predictor"], hidden.astype(jnp.float32))
    Tc = labels.shape[1]
    logits = logits[:, :Tc]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * label_mask) / jnp.maximum(jnp.sum(label_mask), 1)


def speech_decoder_loss(params, cfg: SpeechDecoderConfig,
                        hidden: jnp.ndarray, hidden_lens: jnp.ndarray,
                        y: jnp.ndarray, y_lens: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced CE (decoder.py:190-292): input [pre_nn(hidden)+bos ; sos,y],
    target [y, eos]; hidden block sees itself bidirectionally, token block is
    causal and sees the valid hidden block."""
    B, Th, D = hidden.shape
    Ty = y.shape[1]
    h_mask = jnp.arange(Th)[None, :] < hidden_lens[:, None]

    pre = sd.pre_nn(params, cfg, hidden, h_mask)
    bos = sd.embedding(params["embedding"], jnp.full((B, 1), cfg.bos_id))
    h_block = jnp.concatenate([bos, pre], axis=1)            # [B, Th+1, D]
    h_blk_mask = jnp.concatenate([jnp.ones((B, 1), bool), h_mask], axis=1)
    Lh = Th + 1

    x_tok = jnp.concatenate([jnp.full((B, 1), cfg.sos_id), y], axis=1)  # [B, Ty+1]
    x_emb = sd.embedding(params["embedding"], x_tok)
    t_mask = jnp.arange(Ty + 1)[None, :] <= y_lens[:, None]  # sos + y_len tokens

    from ..models.layers import NEG_INF, rms_norm, rotary_embed

    S = Lh + Ty + 1
    x = jnp.concatenate([h_block, x_emb], axis=1)            # [B, S, D]
    valid = jnp.concatenate([h_blk_mask, t_mask], axis=1)

    # visibility (decoder.py:247-255): every row sees the valid hidden block;
    # token rows additionally see earlier tokens (causal). For hidden rows the
    # token-causal term is vacuously empty.
    idx = jnp.arange(S)
    row, col = idx[:, None], idx[None, :]
    base = (col < Lh) | ((col >= Lh) & (col <= row))  # [S, S]
    vis = base[None] & valid[:, None, :] & valid[:, :, None]

    H, dk = cfg.num_heads, cfg.head_dim
    cos, sin = rotary_embed(jnp.arange(S), dk, cfg.rope_theta)

    def rot(t):
        d2 = t.shape[-1] // 2
        r = jnp.concatenate([-t[..., d2:], t[..., :d2]], axis=-1)
        return t * cos[None, :, None, :] + r * sin[None, :, None, :]

    def layer_fn(xc, lp):
        h = rms_norm(lp["ln1"], xc, cfg.rms_eps)
        q = rot(linear(lp["q"], h).reshape(B, S, H, dk))
        k = rot(linear(lp["k"], h).reshape(B, S, H, dk))
        v = linear(lp["v"], h).reshape(B, S, H, dk)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(dk)
        scores = jnp.where(vis[:, None], scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(xc.dtype)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, S, H * dk)
        xc = xc + linear(lp["o"], o)
        h2 = rms_norm(lp["ln2"], xc, cfg.rms_eps)
        xc = xc + linear(lp["down"],
                         jax.nn.silu(linear(lp["gate"], h2)) * linear(lp["up"], h2))
        return xc, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    x = rms_norm(params["final_norm"], x, cfg.rms_eps)
    logits = linear(params["out"], x[:, Lh:])                # [B, Ty+1, V]

    # target: y with eos at position y_lens (decoder.py:222-225)
    tgt = jnp.concatenate([y, jnp.full((B, 1), cfg.pad_id)], axis=1)
    eos_pos = jnp.arange(Ty + 1)[None, :] == y_lens[:, None]
    tgt = jnp.where(eos_pos, cfg.eos_id, tgt)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * t_mask)  # sum-reduction CE (decoder.py:19)


class TrainState(NamedTuple):
    trainable: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def init_train_state(trainable: dict, optimizer) -> TrainState:
    return TrainState(trainable=trainable,
                      opt_state=optimizer.init(trainable),
                      step=jnp.zeros((), jnp.int32))


def train_step(state: TrainState, frozen: dict, optimizer,
               cfg: AudioLLMConfig, dcfg: SpeechDecoderConfig,
               batch: dict) -> Tuple[TrainState, dict]:
    """One combined step: state-head CE (+ optional speech-decoder CE when the
    batch carries codec targets)."""

    def loss_fn(trainable):
        loss = audio_llm_loss(
            {k: trainable[k] for k in ("encoder_user", "adapter_user", "predictor")},
            frozen, cfg, batch["fbank"], batch["labels"], batch["label_mask"])
        if "dec_hidden" in batch:
            loss = loss + 0.1 * speech_decoder_loss(
                trainable["speech_decoder"], dcfg, batch["dec_hidden"],
                batch["dec_hidden_lens"], batch["dec_y"], batch["dec_y_lens"]) \
                / batch["dec_y"].shape[0]
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    return (TrainState(trainable, opt_state, state.step + 1),
            {"loss": loss})
