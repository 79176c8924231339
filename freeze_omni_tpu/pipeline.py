"""Inference pipeline façade.

Provides both public APIs of the reference:

- `InferencePipeline.speech_dialogue(audio, **outputs)` — the upstream
  dict-style stage machine used by bin/inference.py:129 ('pre' -> 'dialog_sl'/
  'dialog_cl' per chunk -> 'dialog_ss' -> 'dialog_cs' generation loop), with
  text generation restored (the fork deleted it; SURVEY.md §7.5).
- `DuplexPipeline.speech_dialogue(audio, identity, status, role,
  past_key_values, adapter_cache, encoder_cache, pe_index)` — the fork's
  5-tuple dialog-state-prediction API (models/pipeline.py:36-88), where the LLM
  only prefills and the 4-way state head is read for user audio.

Both wrap the same jitted step functions; all session state is explicit
pytrees, so any pipeline object can serve any session ("Model as a Server",
bin/pool.py — externalized caches).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import SystemConfig
from .models import adapter as adapter_mod
from .models import audio_llm
from .models import encoder as encoder_mod
from .models import qwen2
from .utils.tokenizer import ByteTokenizer, ChatTemplate


def post_process(text: str) -> str:
    """Normalize model text for TTS (models/pipeline.py:90-130 behavior):
    unify CJK/ASCII punctuation, strip markup and whitespace runs, reformat
    numbered lists, and guarantee terminal punctuation."""
    for a, b in [("、", "，"), ("(", ","), (")", ","), ("（", "，"), ("）", "，")]:
        text = text.replace(a, b)
    text = re.sub(r"[\n\r\t]", "", text)
    text = re.sub(r"[*_`~]", "", text)
    text = re.sub(r"(\.|\:)\s+", r"\1", text)
    if re.search(r"[一-龥]", text):
        text = re.sub(r"(\d+)\.\s*([一-龥A-Za-z])", r"\1：\2", text)
    else:
        text = re.sub(r"(\d+)\.\s*([\w])", r"\1:\2", text)
    if text and text[-1] not in ["。", "？", "！", ".", "?", "!"]:
        if text[-1] in [",", "，", ";", "；", ":", "：", "、"]:
            text = text[:-1] + "。"
        else:
            text += "。"
    return text


class _Core:
    """Shared compiled-step holder."""

    def __init__(self, cfg: SystemConfig, params: Optional[dict] = None,
                 tokenizer=None, seed: int = 0, llm_dtype=jnp.float32):
        self.cfg = cfg
        self.acfg = cfg.audio_llm
        self.tokenizer = tokenizer or ByteTokenizer(cfg.audio_llm.llm.vocab_size)
        self.chat = ChatTemplate(self.tokenizer)
        if params is None:
            params = audio_llm.init_params(jax.random.PRNGKey(seed), self.acfg,
                                           llm_dtype=llm_dtype)
        self.params = params
        self._rng = jax.random.PRNGKey(seed + 1)

        self._recognize = jax.jit(
            audio_llm.recognize_step, static_argnames=("cfg", "identity"))
        self._prefill_tokens = jax.jit(
            audio_llm.prefill_tokens, static_argnames=("cfg",))
        self._generate = jax.jit(
            audio_llm.generate_step, static_argnames=("cfg", "sampling"))
        self._generate_segment = jax.jit(
            audio_llm.generate_segment,
            static_argnames=("cfg", "sampling", "n_steps", "eod_id"))
        self._prefill_sample = jax.jit(
            audio_llm.prefill_and_sample, static_argnames=("cfg", "sampling"))

        # precompute chat-template prefix embeddings (audioLLM.py:245-251)
        self.user_prefix_embeds = qwen2.embed_tokens(
            params["llm"], jnp.asarray(self.chat.user_prefix_ids))
        self.system_prefix_embeds = qwen2.embed_tokens(
            params["llm"], jnp.asarray(self.chat.system_prefix_ids))

    def next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def role_kv(self, role: str) -> qwen2.KVCache:
        ids = jnp.asarray(self.chat.role_prompt_ids(role))[None]
        # cache dtype follows the ACTIVATION dtype (what embed_tokens emits) —
        # the first tree leaf can be an f32 quantization scale in an int8 tree
        kv = qwen2.init_cache(self.acfg.llm, 1,
                              dtype=self.user_prefix_embeds.dtype)
        return self._prefill_tokens(self.params, self.acfg, ids, kv)


class InferencePipeline:
    """Upstream dict-style stage machine (offline wav->wav path)."""

    def __init__(self, cfg: SystemConfig, params: Optional[dict] = None,
                 tokenizer=None, seed: int = 0, core: Optional[_Core] = None):
        self.core = core or _Core(cfg, params, tokenizer, seed)
        self.cfg = self.core.cfg
        self.acfg = self.core.acfg

    # -- public API (parity with models/pipeline.py + upstream dict flow) ----

    def speech_dialogue(self, audio, **outputs) -> dict:
        core = self.core
        stat = outputs.get("stat", "pre")

        if stat == "pre":
            role = outputs.get("role", "You are a helpful assistant.")
            kv = core.role_kv(role)
            caches = audio_llm.init_session(self.acfg, 1)._replace(kv=kv)
            return {
                "stat": "dialog_sl", "role": role, "caches": caches,
                "adapter_cache": True, "encoder_cache": True, "pe_index": 0,
                "past_tokens": [], "is_first_chunk": True,
            }

        caches: audio_llm.SessionCaches = outputs["caches"]
        # reference callers reset audio caches by nulling these keys
        # (bin/inference.py:133-135)
        if outputs.get("adapter_cache", True) is None or \
           outputs.get("encoder_cache", True) is None:
            caches = audio_llm.reset_audio_caches(self.acfg, caches)
            outputs["adapter_cache"] = True
            outputs["encoder_cache"] = True
            outputs["is_first_chunk"] = True

        if stat in ("dialog_sl", "dialog_cl") and audio is not None:
            is_sl = jnp.asarray([bool(outputs.get("is_first_chunk", stat == "dialog_sl"))])
            probs, caches = core._recognize(
                core.params, self.acfg, "user", jnp.asarray(audio), is_sl,
                core.user_prefix_embeds, caches)
            out = dict(outputs)
            probs = np.asarray(probs)[0]
            new_stat = "dialog_cl"
            # upstream server semantics: the state head can auto-trigger the
            # response ('dialog_ss') or end-without-response ('dialog_el');
            # bin/inference.py instead forces transitions manually, so this is
            # opt-in via outputs['auto_transition']
            if outputs.get("auto_transition"):
                thr = self.cfg.duplex.resp_threshold
                if probs[1] > thr:
                    new_stat = "dialog_ss"
                elif probs[2] > thr:
                    new_stat = "dialog_el"
            out.update(stat=new_stat, caches=caches,
                       state_probs=probs, is_first_chunk=False)
            return out

        if stat == "dialog_ss":
            ids = jnp.asarray(core.chat.system_prefix_ids)[None]
            tok, hidden, kv = core._prefill_sample(
                core.params, self.acfg, ids, caches.kv, core.next_key(),
                self.cfg.sampling)
            caches = caches._replace(kv=kv)
            past = [int(tok[0])]
            out = dict(outputs)
            out.update(stat="dialog_cs", caches=caches, past_tokens=past,
                       text=core.tokenizer.decode(past),
                       hidden_state=np.asarray(hidden)[None])  # [1, 1, D]
            return out

        if stat == "dialog_cs":
            last = jnp.asarray([outputs["past_tokens"][-1]])
            tok, hidden, kv = core._generate(core.params, self.acfg, last,
                                             caches.kv, core.next_key(),
                                             self.cfg.sampling)
            caches = caches._replace(kv=kv)
            past = outputs["past_tokens"] + [int(tok[0])]
            new_stat = "dialog_sl" if int(tok[0]) == core.tokenizer.eod_id \
                else "dialog_cs"
            out = dict(outputs)
            out.update(stat=new_stat, caches=caches, past_tokens=past,
                       text=core.tokenizer.decode(
                           [t for t in past if t != core.tokenizer.eod_id]),
                       hidden_state=np.asarray(hidden)[None])
            return out

        raise ValueError(f"unhandled stat {stat!r}")

    def speech_dialogue_segment(self, outputs: dict, n_steps: int = 16) -> dict:
        """TPU-native fast path for 'dialog_cs': generate up to n_steps tokens
        in one on-device lax.scan dispatch instead of n per-token round trips.
        Adds 'segment_tokens' (list) and 'segment_hiddens' ([1, k, D] numpy,
        aligned with segment_tokens) to the outputs dict."""
        core = self.core
        caches: audio_llm.SessionCaches = outputs["caches"]
        last = jnp.asarray([outputs["past_tokens"][-1]])
        toks, hiddens, done, kv = core._generate_segment(
            core.params, self.acfg, last, caches.kv, core.next_key(),
            self.cfg.sampling, n_steps=n_steps, eod_id=core.tokenizer.eod_id)
        toks = list(np.asarray(toks)[0])
        hiddens = np.asarray(hiddens, np.float32)
        eod = core.tokenizer.eod_id
        if eod in toks:
            k = toks.index(eod) + 1  # keep the eod token (stage flips below)
            toks, hiddens = toks[:k], hiddens[:, :k]
        past = outputs["past_tokens"] + [int(t) for t in toks]
        new_stat = "dialog_sl" if past[-1] == eod else "dialog_cs"
        out = dict(outputs)
        out.update(stat=new_stat, caches=caches._replace(kv=kv),
                   past_tokens=past,
                   text=core.tokenizer.decode([t for t in past if t != eod]),
                   segment_tokens=[int(t) for t in toks],
                   segment_hiddens=hiddens)
        return out

    def post_process(self, text: str) -> str:
        return post_process(text)


class DuplexPipeline:
    """Fork-style 5-tuple API for duplex dialog-state prediction
    (models/pipeline.py:36-88)."""

    def __init__(self, cfg: SystemConfig, params: Optional[dict] = None,
                 tokenizer=None, seed: int = 0, core: Optional[_Core] = None):
        self.core = core or _Core(cfg, params, tokenizer, seed)
        self.cfg = self.core.cfg
        self.acfg = self.core.acfg

    def speech_dialogue(self, audio, identity: str, status: str,
                        role: Optional[str] = None, past_key_values=None,
                        adapter_cache=None, encoder_cache=None, pe_index=0):
        """Returns (prediction_probs, past_key_values, adapter_cache,
        encoder_cache, pe_index) — the fork's signature. Caches here are the
        explicit pytrees (AdapterState, EncoderState, KVCache)."""
        core = self.core
        if status == "pre":
            kv = core.role_kv(role or self.cfg.duplex.default_prompt)
            return None, kv, None, None, None

        assert past_key_values is not None, "must set system role first"
        b = past_key_values.length.shape[0]
        enc_state = encoder_cache if encoder_cache is not None \
            else encoder_mod.init_state(self.acfg.encoder, b)
        adp_state = adapter_cache if adapter_cache is not None \
            else adapter_mod.init_state(self.acfg.adapter, b)

        caches = audio_llm.init_session(self.acfg, b)
        if identity == "user":
            caches = caches._replace(enc_user=enc_state, adp_user=adp_state,
                                     kv=past_key_values)
            prefix = core.user_prefix_embeds
        else:
            caches = caches._replace(enc_system=enc_state, adp_system=adp_state,
                                     kv=past_key_values)
            prefix = core.system_prefix_embeds

        is_sl = jnp.asarray([status == "ipu_sl"] * b)
        probs, caches = core._recognize(core.params, self.acfg, identity,
                                        jnp.asarray(audio), is_sl, prefix, caches)

        if identity == "user":
            enc_state, adp_state = caches.enc_user, caches.adp_user
            # ONE device fetch for the prediction + pe_index together; the
            # prediction is the only value the host genuinely needs per chunk
            probs_np, pe = jax.device_get((probs, enc_state.pe_index))
            prediction = {"state_1": float(probs_np[0, 1]),
                          "state_2": float(probs_np[0, 2])}
            pe = int(pe[0])
        else:
            enc_state, adp_state = caches.enc_system, caches.adp_system
            prediction = None  # no prediction for system audio (audioLLM.py:396-397)
            # no sync for system chunks: pe_index stays a device scalar (it
            # lives inside EncoderState anyway; the return is API parity only
            # and callers just round-trip it)
            pe = enc_state.pe_index

        return prediction, caches.kv, adp_state, enc_state, pe

    def post_process(self, text: str) -> str:
        return post_process(text)
