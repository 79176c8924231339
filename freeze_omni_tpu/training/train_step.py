"""Training: the Freeze-Omni recipe, TPU-native.

The reference ships training-style forwards but no trainer (SURVEY.md §4): the
encoder has a masked batch forward (models/encoder/encoder.py:104-147), the
AudioLLM computes state predictions against a frozen LLM (the 3-stage
curriculum of the paper: encoder/adapter/state-head train, LLM frozen), and the
speech decoder has a CE training forward with block masks
(models/decoder/decoder.py:190-292). This module provides jittable, mesh-
shardable train steps for both:

- `encoder_ctc_loss`: input-side stage 1 — encoder ASR pretraining with a CTC
  head (no LLM involved), the curriculum's first stage.
- `asr_align_loss`: input-side stages 2/3 — fbank -> encoder -> adapter ->
  frozen-LLM causal forward over [prompt?; audio; transcript] with text CE.
  Which parts train is decided purely by membership in the `trainable` dict
  (stage 2: adapter [+encoder]; stage 3: prompt_embeddings only), so one loss
  serves both stages.
- `audio_llm_loss`: duplex stage — fbank -> encoder -> adapter -> frozen-LLM
  causal forward -> 4-class state-head CE per chunk (chunk labels as in
  system.png: 0 continue, 1 respond, 2 end-without-response).
- `speech_decoder_loss`: output-side — pre-NN + main-stack teacher-forced CE
  over [hidden; sos,y] with the reference's visibility structure (hidden block
  bidirectional; tokens causal, attending the hidden block). (Output-side
  stage 1, the codec itself, lives in training/codec_gan.py.)
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
from ..models.layers import linear, linear_init


def init_ctc_head(key, cfg: AudioLLMConfig, vocab: int) -> dict:
    """CTC projection for input-side stage 1: encoder dim -> vocab+1 (the
    extra class is the blank, id = vocab)."""
    return linear_init(key, cfg.encoder.output_dim, vocab + 1,
                       dtype=jnp.float32)


def encoder_ctc_loss(trainable, cfg: AudioLLMConfig,
                     fbank: jnp.ndarray, fbank_lens: jnp.ndarray,
                     tokens: jnp.ndarray, token_lens: jnp.ndarray
                     ) -> jnp.ndarray:
    """Input-side stage 1 (the paper's encoder ASR pretraining): encoder +
    CTC head, mean per-utterance CTC negative log-likelihood.

    trainable: {'encoder_user', 'ctc_head'}. fbank [B, T, 80] with per-row
    valid frame counts `fbank_lens`; tokens [B, N] int targets (ids < vocab,
    blank excluded) with `token_lens`. The encoder's chunk-causal training
    mask (dynamic-chunk semantics) is applied by encoder.forward's default."""
    enc = encoder_mod.forward(trainable["encoder_user"], cfg.encoder, fbank)
    logits = linear(trainable["ctc_head"], enc.astype(jnp.float32))
    blank = logits.shape[-1] - 1
    t_enc = ((fbank_lens - 1) // 2 - 1) // 2  # Conv2dSubsampling4 arithmetic
    T = enc.shape[1]
    logit_pad = (jnp.arange(T)[None, :] >= t_enc[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(tokens.shape[1])[None, :]
                 >= token_lens[:, None]).astype(jnp.float32)
    per_utt = optax.ctc_loss(logits, logit_pad, tokens, label_pad,
                             blank_id=blank)
    return jnp.mean(per_utt / jnp.maximum(token_lens.astype(jnp.float32), 1.0))


def asr_align_loss(trainable, frozen, cfg: AudioLLMConfig,
                   fbank: jnp.ndarray, text_ids: jnp.ndarray,
                   text_mask: jnp.ndarray) -> jnp.ndarray:
    """Input-side stages 2/3: text CE through the frozen LLM.

    The causal sequence is [prompt_embeddings?; audio embeds; transcript
    embeds]; cross-entropy is taken on the transcript positions (each token
    predicted from the previous position, the first from the last audio
    position). Module selection is by dict membership: a module key present in
    `trainable` trains, otherwise its `frozen` copy is used — stage 2 passes
    trainable={'adapter_user'[, 'encoder_user']}, stage 3 passes
    trainable={'prompt_embeddings'} (audioLLM.py:169-195 tables).

    Audio rows are taken full-valid: manifests pad utterances with silence
    (real audio for an ASR objective), so no audio validity mask is threaded.
    text_mask [B, Tt] masks transcript padding."""
    def pick(name):
        return trainable[name] if name in trainable else frozen[name]

    enc = encoder_mod.forward(pick("encoder_user"), cfg.encoder, fbank)
    audio = adapter_mod.forward(pick("adapter_user"), cfg.adapter, enc)
    B, Ta, D = audio.shape
    parts = [audio]
    if "prompt_embeddings" in trainable or "prompt_embeddings" in frozen:
        pe = pick("prompt_embeddings")  # [P, D]
        parts.insert(0, jnp.broadcast_to(
            pe[None], (B,) + pe.shape).astype(audio.dtype))
    text_emb = qwen2.embed_tokens(frozen["llm"], text_ids).astype(audio.dtype)
    seq = jnp.concatenate(parts + [text_emb], axis=1)
    S = seq.shape[1]
    cache = qwen2.init_cache(cfg.llm, B, max_len=S + 1, dtype=seq.dtype)
    hidden, _ = qwen2.forward(frozen["llm"], cfg.llm, seq,
                              jnp.ones((B, S), bool), cache)
    Tt = text_ids.shape[1]
    pred = hidden[:, S - Tt - 1: S - 1].astype(jnp.float32)
    logits = qwen2.logits(frozen["llm"], cfg.llm, pred)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, text_ids[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * text_mask) / jnp.maximum(jnp.sum(text_mask), 1)


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


def lora_lm_loss(trainable, frozen, cfg: AudioLLMConfig,
                 text_ids: jnp.ndarray, text_mask: jnp.ndarray,
                 lora_scale: float = 1.0) -> jnp.ndarray:
    """LoRA adaptation stage: next-token CE through the frozen LLM with only
    the low-rank adapter trainable (models/lora.py — the working form of the
    reference's dead LoRA block, audioLLM.py:150-157).

    trainable: {'lora': {proj: {'a','b'}}}; frozen: {'llm'}. text_ids [B, T],
    text_mask [B, T] (padding). Token t is predicted from position t-1; the
    base weights, embeddings and lm_head never receive gradients."""
    emb = qwen2.embed_tokens(frozen["llm"], text_ids)
    B, T, D = emb.shape
    cache = qwen2.init_cache(cfg.llm, B, max_len=T + 1, dtype=emb.dtype)
    hidden, _ = qwen2.forward(frozen["llm"], cfg.llm, emb,
                              jnp.ones((B, T), bool), cache,
                              lora=trainable["lora"], lora_scale=lora_scale)
    logits = qwen2.logits(frozen["llm"], cfg.llm,
                          hidden[:, :-1].astype(jnp.float32))
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = text_ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = (text_mask[:, 1:] & text_mask[:, :-1]).astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1)


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


STAGES = ("ctc", "align", "prompt", "state", "decoder", "lora", "all")


def stage_loss(stage: str, trainable, frozen, cfg: AudioLLMConfig,
               dcfg: Optional[SpeechDecoderConfig], batch: dict) -> jnp.ndarray:
    """Dispatch one curriculum stage to its loss. 'align' and 'prompt' share
    asr_align_loss (they differ only in which params sit in `trainable`);
    'all' = the combined duplex step (state head + optional decoder CE)."""
    if stage == "ctc":
        return encoder_ctc_loss(trainable, cfg, batch["fbank"],
                                batch["fbank_lens"], batch["tokens"],
                                batch["token_lens"])
    if stage in ("align", "prompt"):
        return asr_align_loss(trainable, frozen, cfg, batch["fbank"],
                              batch["text_ids"], batch["text_mask"])
    if stage == "state":
        return audio_llm_loss(trainable, frozen, cfg, batch["fbank"],
                              batch["labels"], batch["label_mask"])
    if stage == "decoder":
        return speech_decoder_loss(
            trainable["speech_decoder"], dcfg, batch["dec_hidden"],
            batch["dec_hidden_lens"], batch["dec_y"],
            batch["dec_y_lens"]) / batch["dec_y"].shape[0]
    if stage == "lora":
        return lora_lm_loss(trainable, frozen, cfg, batch["text_ids"],
                            batch["text_mask"])
    raise ValueError(f"unknown stage {stage!r} (expected one of {STAGES})")


def stage_step(stage: str, state: TrainState, frozen: dict, optimizer,
               cfg: AudioLLMConfig, dcfg: Optional[SpeechDecoderConfig],
               batch: dict) -> Tuple[TrainState, dict]:
    """One optimizer step of a single curriculum stage ('all' uses
    `train_step`, the combined duplex objective)."""
    if stage == "all":
        return train_step(state, frozen, optimizer, cfg, dcfg, batch)
    loss, grads = jax.value_and_grad(
        lambda t: stage_loss(stage, t, frozen, cfg, dcfg, batch)
    )(state.trainable)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    return (TrainState(trainable, opt_state, state.step + 1),
            {"loss": loss})
