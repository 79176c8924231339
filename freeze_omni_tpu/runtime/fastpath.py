"""Single-dispatch first-response fast path.

Measured on the tunneled v5e: per-dispatch round-trip latency (~55 ms)
dominates speech-to-first-audio — device compute for the whole TTS stage is
~1.4 ms. This fuses the ENTIRE first response into one jitted program:

  assistant-prefix prefill -> first text segment (scan) -> re-embed the text
  tokens -> speech-decoder pre-NN + prefix-KV + prefill -> codec-token decode
  scan -> vocoder -> first PCM

so first audio costs exactly one dispatch + one host sync. The reference's
host-side text post-processing (pipeline.post_process) is string-level and
cannot run on-device; the fast path feeds raw generated tokens to the speech
decoder for the FIRST sentence and later sentences go through the standard
host path — acceptable because post_process only normalizes punctuation
(models/pipeline.py:90-130).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import (AudioLLMConfig, CodecConfig, SamplingConfig,
                      SpeechDecoderConfig)
from ..models import audio_llm, codec as codec_mod, qwen2
from ..models import speech_decoder as sd


@partial(jax.jit, static_argnames=("acfg", "dcfg", "ccfg", "sampling",
                                   "n_text", "n_codec", "top_k", "eod_id",
                                   "penalty_window", "penalty"))
def first_response(params, tts_params, acfg: AudioLLMConfig,
                   dcfg: SpeechDecoderConfig, ccfg: CodecConfig,
                   assistant_ids, kv, rng, sampling: SamplingConfig,
                   n_text: int, n_codec: int, top_k: int, eod_id: int,
                   global_tokens, penalty_window: int = 10,
                   penalty: float = 1.1):
    """Returns (pcm [B, 1, samples], text_tokens [B, n_text+1], text_done [B],
    codec_tokens [B, n_codec], n_valid_codec [B], kv). One device dispatch
    end-to-end; B > 1 batches concurrently-speaking sessions into the same
    dispatch (assistant_ids [B, T], kv batch B, global_tokens [B, 1, G]).
    The PCM length is static; callers trim host-side to
    n_valid_codec (minus the look-ahead padding when no eos fired) — matching
    the reference's eos stop + right-padding trim (llm2tts.py:140-160).
    penalty_window/penalty: the repetition penalty the reference applies in
    its codec decode loop when window > 0 (decoder.py:349-351); the
    reference's own runtime default is -1 = disabled (llm2tts.py:115), which
    TTSConfig mirrors."""
    k1, k2 = jax.random.split(rng)
    B = assistant_ids.shape[0]

    # 1) text: prefill assistant prefix + first segment, all on-device
    toks, hiddens, done, kv = audio_llm.prefill_and_generate(
        params, acfg, assistant_ids, kv, k1, sampling,
        n_steps=n_text, eod_id=eod_id)

    # 2) re-embed the generated tokens; fold 3584-dim frames to decoder idim
    #    (bin/inference.py:86-90 reshape semantics)
    emb = qwen2.embed_tokens(params["llm"], toks)          # [B, n, D]
    emb = emb.astype(jnp.float32).reshape(B, -1, dcfg.idim)
    prefix = hiddens.astype(jnp.float32).reshape(B, -1, dcfg.idim)

    # 3) speech decoder preamble (pre-NN + prefix-KV + [bos, hidden] prefill)
    pre = sd.pre_nn(tts_params["decoder"], dcfg, emb)
    bos = sd.embedding(tts_params["decoder"]["embedding"],
                       jnp.full((B, 1), dcfg.bos_id))
    block = jnp.concatenate([bos, pre], axis=1)
    cache = sd.init_cache(dcfg, B)
    if dcfg.use_prefix_kv:
        cache = sd.prefix_prefill(tts_params["decoder"], dcfg, prefix,
                                  jnp.ones(prefix.shape[:2], bool), cache)
    _, cache = sd.prefill(tts_params["decoder"], dcfg, block,
                          jnp.ones(block.shape[:2], bool), cache)

    # 4) codec-token scan (reference decode semantics: repetition penalty over
    #    the recent-token window, decoder.py:349-351) + vocoder
    state = sd.init_decode_state(dcfg, cache, max(penalty_window, 1))
    codec_toks, state = sd.decode_segment(
        tts_params["decoder"], dcfg, state, k2, n_steps=n_codec, top_k=top_k,
        penalty_window=penalty_window, penalty=penalty)
    # tokens from the first eos/pad onward are invalid: count the valid prefix
    # and repeat the last valid token through the tail so the vocoder's
    # receptive field near the cut sees speech, not clipped specials
    invalid = codec_toks >= dcfg.codec_vocab  # [1, n] specials are >= vocab
    n_valid = jnp.where(jnp.any(invalid, axis=1),
                        jnp.argmax(invalid, axis=1),
                        jnp.asarray(n_codec)).astype(jnp.int32)   # [1]
    pos = jnp.arange(n_codec)[None, :]
    last_valid = jnp.maximum(n_valid - 1, 0)[:, None]
    fill = jnp.take_along_axis(codec_toks, last_valid, axis=1)
    codes = jnp.where(pos < n_valid[:, None], codec_toks, fill)
    codes = jnp.clip(codes, 0, dcfg.codec_vocab - 1)[:, :, None]
    pcm = codec_mod.decode(tts_params["codec"], ccfg, codes, global_tokens)

    return pcm, toks, done, codec_toks, n_valid, kv
