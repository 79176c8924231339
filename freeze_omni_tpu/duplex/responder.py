"""Duplex responder: close the loop from dialog_ss to spoken output.

The fork stops at emitting `dialog_ss` to its (absent) parent floor
coordinator (bin/dialog_state_pred.py:826-837); the upstream system then
speaks. This module restores that capability inside the framework: when a
session decides to respond, generate text from the shared LLM context
(on-device segments), synthesize speech per sentence (AR decoder + codec), and
feed the synthesized audio back into the session as `system`-identity input so
the dialog-state context hears the system speaking — the full duplex loop.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..frontend.wav import resample
from ..models import qwen2
from ..pipeline import _Core
from ..tts import StreamingTTS

SENTENCE_SUFFIXES = ("。", "：", "？", "！", ".", "?", "!", "\n")


def split_sentences(tokenizer, eod_id: int, buf_toks: list, buf_hids: list,
                    toks, hids) -> list:
    """Shared sentence accumulator for the solo responder AND the batched
    continuation path: feed new (token, hidden [1,1,D]) pairs into the
    running buffers; a sentence-suffix piece or eod completes the buffer.
    Returns [(tokens, hiddens), ...] of completed sentences; the buffers are
    left holding any unterminated tail."""
    done_sents = []
    for j, t in enumerate(toks):
        if t != eod_id:
            buf_toks.append(int(t))
            buf_hids.append(hids[j])
        piece = tokenizer.decode([int(t)]) if t != eod_id else ""
        if (piece.endswith(SENTENCE_SUFFIXES) or t == eod_id) and buf_toks:
            done_sents.append((list(buf_toks), list(buf_hids)))
            buf_toks.clear()
            buf_hids.clear()
    return done_sents


class DuplexResponder:
    def __init__(self, core: _Core, tts: StreamingTTS, cfg: SystemConfig,
                 max_tokens: Optional[int] = None,
                 segment: Optional[int] = None, embed_fn=None):
        self.core = core
        self.tts = tts
        self.cfg = cfg
        # token -> LLM-embedding lookup. Default: direct local lookup. Under
        # multi-host serving the table is sharded over the GLOBAL mesh, so
        # the lookup is a collective every host must join — the service
        # passes the engine's (bundle-broadcasting) embed_tokens instead.
        self.embed_fn = embed_fn
        # response length/cadence come from the config (one source of truth
        # with the batched service); explicit args override
        self.max_tokens = (max_tokens if max_tokens is not None
                           else cfg.duplex.resp_max_tokens)
        self.segment = (segment if segment is not None
                        else cfg.duplex.resp_segment)

    def respond(self, kv: qwen2.KVCache
                ) -> Iterator[Tuple[str, Optional[np.ndarray], qwen2.KVCache]]:
        """Generate a response on the session's shared KV. Yields
        (sentence_text, pcm_16k or None, updated_kv) per sentence."""
        core = self.core
        acfg = self.cfg.audio_llm
        ids = jnp.asarray(core.chat.system_prefix_ids)[None]
        tok, hidden, kv = core._prefill_sample(
            core.params, acfg, ids, kv, core.next_key(), self.cfg.sampling)

        last = int(tok[0])
        n = 1
        eod = core.tokenizer.eod_id
        done = last == eod
        cur_tokens: list = []
        cur_hiddens: list = []
        if not done:
            cur_tokens.append(last)
            cur_hiddens.append(np.asarray(hidden, np.float32)[:, None])

        while not done and n < self.max_tokens:
            toks, hids, d, kv = core._generate_segment(
                core.params, acfg, jnp.asarray([last]), kv,
                core.next_key(), self.cfg.sampling, n_steps=self.segment,
                eod_id=eod)
            seg = list(np.asarray(toks)[0])
            hids = np.asarray(hids, np.float32)
            if eod in seg:
                seg = seg[: seg.index(eod) + 1]
                done = True
            per_tok = [hids[:, j: j + 1] for j in range(len(seg))]
            for st, sh in split_sentences(core.tokenizer, eod, cur_tokens,
                                          cur_hiddens, seg, per_tok):
                out = self._synthesize(st, sh)
                if out is not None:
                    yield out[0], out[1], kv
            n += len(seg)
            if seg:
                last = int(seg[-1])
        if cur_tokens:
            out = self._synthesize(cur_tokens, cur_hiddens)
            if out is not None:
                yield out[0], out[1], kv

    def _synthesize(self, tokens, hiddens):
        core = self.core
        eod = core.tokenizer.eod_id
        text = core.tokenizer.decode([t for t in tokens if t != eod])
        if not text.strip():
            return None
        from ..pipeline import post_process

        dec_idim = self.cfg.tts.decoder.idim
        ids = core.tokenizer.encode(post_process(text))
        if not ids:
            return (text, None)
        if self.embed_fn is not None:
            emb = self.embed_fn(ids)
        else:
            emb = qwen2.embed_tokens(core.params["llm"], np.asarray(ids))
        emb = np.asarray(emb, np.float32).reshape(-1, dec_idim)[None]
        prefix = np.concatenate(hiddens, axis=1)
        prefix = np.asarray(prefix, np.float32).reshape(-1, dec_idim)[None]
        segs = [s[0, 0] for s in self.tts.run(emb, prefix=prefix)]
        if not segs:
            return (text, None)
        pcm24 = np.concatenate(segs)
        pcm16 = resample(pcm24, self.cfg.tts.codec.sample_rate, 16000)
        return (text, pcm16)
