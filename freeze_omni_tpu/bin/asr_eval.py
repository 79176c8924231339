"""Speech-understanding evaluation: CER/WER over a wav+transcript manifest.

Harness for the reference's ASR benchmark tables (BASELINE.md: aishell CER /
LibriSpeech WER, chunk=inf and streaming chunk=4). Listens to each wav through
the streaming pipeline, generates the text response/transcript, scores against
the manifest. With converted reference checkpoints this reproduces the
published evaluation; with random weights it validates the harness itself.

Manifest: tab-separated lines "path<TAB>transcript".

Usage:
  python -m freeze_omni_tpu.bin.asr_eval --preset tiny --manifest dev.tsv \
      [--char_level] [--max_utts N] [--max_tokens N]
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np


def transcribe(pipeline, chunker, wav: np.ndarray, max_tokens: int,
               role: str = "Transcribe the user's speech exactly.") -> str:
    """Listen chunk-by-chunk then generate text (offline stage machine).
    The role prompt selects the task (transcription here; bin/qa_eval.py
    passes an answering prompt)."""
    outputs = pipeline.speech_dialogue(None, stat="pre", role=role)
    chunk = chunker.get_chunk_size()
    n = int(math.ceil(len(wav) / chunk)) * chunk
    padded = np.zeros(n, np.float32)
    padded[: len(wav)] = wav
    for i in range(0, n, chunk):
        outputs = pipeline.speech_dialogue(chunker.process(padded[i : i + chunk]),
                                           **outputs)
        outputs["stat"] = "dialog_cl"
    chunker.reset()
    outputs["adapter_cache"] = None
    outputs["encoder_cache"] = None
    outputs["stat"] = "dialog_ss"
    outputs = pipeline.speech_dialogue(None, **outputs)
    while outputs["stat"] == "dialog_cs" and \
            len(outputs["past_tokens"]) <= max_tokens:
        outputs = pipeline.speech_dialogue_segment(outputs, n_steps=16)
    tok = pipeline.core.tokenizer
    return tok.decode([t for t in outputs["past_tokens"] if t != tok.eod_id])


def batched_transcribe(pipeline, cfg, wavs, max_tokens: int,
                       role: str = "Transcribe the user's speech exactly.",
                       greedy: bool = True):
    """Batched eval throughput path: B utterances share every device step
    (role prefill, chunked listen with per-row validity, ONE fused
    prefill+generate with done-masking). Semantically the batched twin of
    `transcribe` — utterances are zero-padded to the group's max chunk count
    (group by similar length for best parity). greedy=True (top_k=1) makes
    rows independent of batch composition."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..frontend.chunker import OfflineChunker
    from ..models import audio_llm, qwen2

    core = pipeline.core
    acfg = cfg.audio_llm
    B = len(wavs)
    sampling = (dataclasses.replace(cfg.sampling, top_k=1, top_p=1.0)
                if greedy else cfg.sampling)
    kv_dtype = core.user_prefix_embeds.dtype
    ids = jnp.tile(jnp.asarray(core.chat.role_prompt_ids(role))[None], (B, 1))
    kv = qwen2.init_cache(acfg.llm, B, dtype=kv_dtype)
    kv = core._prefill_tokens(core.params, acfg, ids, kv)
    caches = audio_llm.init_session(acfg, B, kv_dtype=kv_dtype)._replace(kv=kv)

    chunkers = [OfflineChunker(cfg.chunker) for _ in range(B)]
    chunk = chunkers[0].get_chunk_size()
    row_chunks = [int(math.ceil(len(w) / chunk)) for w in wavs]
    n_chunks = max(row_chunks)
    padded = np.zeros((B, n_chunks * chunk), np.float32)
    for b, w in enumerate(wavs):
        padded[b, : len(w)] = w
    for ci in range(n_chunks):
        feats = np.concatenate(
            [chunkers[b].process(padded[b, ci * chunk: (ci + 1) * chunk])
             for b in range(B)], axis=0)
        is_sl = jnp.asarray([ci == 0] * B)
        # rows whose utterance already ended leave their caches untouched —
        # a shorter wav's context must not depend on its batch partners'
        # lengths (zero-pad chunks would otherwise prefill as real audio)
        active = jnp.asarray([ci < row_chunks[b] for b in range(B)])
        _, caches = core._recognize(core.params, acfg, "user",
                                    jnp.asarray(feats), is_sl,
                                    core.user_prefix_embeds, caches,
                                    active=active)

    if not hasattr(batched_transcribe, "_gen"):
        batched_transcribe._gen = jax.jit(
            audio_llm.prefill_and_generate,
            static_argnames=("cfg", "sampling", "n_steps", "eod_id"))
    sys_ids = jnp.tile(jnp.asarray(core.chat.system_prefix_ids)[None], (B, 1))
    eod = core.tokenizer.eod_id
    toks, _, done, _ = batched_transcribe._gen(
        core.params, acfg, sys_ids, caches.kv, core.next_key(), sampling,
        n_steps=max_tokens, eod_id=eod)
    toks = np.asarray(toks)
    out = []
    for b in range(B):
        row = [int(t) for t in toks[b]]
        if eod in row:
            row = row[: row.index(eod)]
        out.append(core.tokenizer.decode(row))
    return out


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="CER/WER evaluation harness")
    p.add_argument("--preset", default="flagship", choices=["tiny", "flagship"])
    p.add_argument("--model_path", default=None,
                   help="reference checkpoint dir (enables real-weight eval)")
    p.add_argument("--llm_path", default=None)
    p.add_argument("--quant", default=0, type=int, choices=[0, 8, 4],
                   help="weight-only quantization bits for the loaded LLM "
                        "(8 required to fit the 7B on one 16 GB chip)")
    p.add_argument("--manifest", required=True,
                   help="tsv: wav_path<TAB>transcript per line")
    p.add_argument("--char_level", action="store_true",
                   help="score CER instead of WER")
    p.add_argument("--max_utts", type=int, default=0)
    p.add_argument("--max_tokens", type=int, default=64)
    p.add_argument("--batch", type=int, default=0,
                   help="batched eval: N utterances (sorted by length) share "
                        "every device step — greedy decoding for "
                        "batch-composition-independent results")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from ..config import flagship_system, tiny_system
    from ..frontend.chunker import OfflineChunker
    from ..frontend.wav import read_wav, resample
    from ..pipeline import InferencePipeline
    from ..utils.metrics import corpus_score

    if args.model_path:
        from ..utils.factory import (build_system_from_reference,
                                     is_native_system, load_native_system)

        if is_native_system(args.model_path):
            cfg, audiollm_params, _, tokenizer = load_native_system(
                args.model_path)
        else:
            cfg, audiollm_params, _, tokenizer = build_system_from_reference(
                args.model_path, args.llm_path,
                quantize_llm_bits=args.quant or None)
        pipeline = InferencePipeline(cfg, params=audiollm_params,
                                     tokenizer=tokenizer, seed=args.seed)
    else:
        cfg = tiny_system() if args.preset == "tiny" else flagship_system()
        pipeline = InferencePipeline(cfg, seed=args.seed)
    chunker = OfflineChunker(cfg.chunker)

    # manifest pass holds only (path, ref, n_frames) — a full eval set's
    # decoded audio (GBs of float32) is never resident at once; wavs load
    # one-at-a-time (serial) or one group at a time (--batch)
    import wave as _wave

    utts = []
    with open(args.manifest) as f:
        for line in f:
            if not line.strip():
                continue
            path, ref = line.rstrip("\n").split("\t", 1)
            with _wave.open(path, "rb") as w:
                frames = w.getnframes()
            utts.append((path, ref, frames))
            if args.max_utts and len(utts) >= args.max_utts:
                break

    def load(path):
        wav, sr = read_wav(path)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        if sr != 16000:
            wav = resample(wav, sr, 16000)
        return wav

    pairs = []
    if args.batch > 1:
        # sort by length so padding within a batch stays small
        order = sorted(range(len(utts)), key=lambda i: utts[i][2])
        for s in range(0, len(order), args.batch):
            group = [utts[i] for i in order[s: s + args.batch]]
            hyps = batched_transcribe(pipeline, cfg,
                                      [load(p) for p, _, _ in group],
                                      args.max_tokens)
            for (_, ref, _), hyp in zip(group, hyps):
                pairs.append((ref, hyp))
                print(f"[{len(pairs)}] ref={ref[:40]!r} hyp={hyp[:40]!r}",
                      file=sys.stderr)
    else:
        for path, ref, _ in utts:
            hyp = transcribe(pipeline, chunker, load(path), args.max_tokens)
            pairs.append((ref, hyp))
            print(f"[{len(pairs)}] ref={ref[:40]!r} hyp={hyp[:40]!r}",
                  file=sys.stderr)

    score = corpus_score(pairs, char_level=args.char_level)
    metric = "cer" if args.char_level else "wer"
    print(json.dumps({"metric": metric, "value": round(100 * score, 2),
                      "unit": "%", "n_utts": len(pairs)}))


if __name__ == "__main__":
    main()
