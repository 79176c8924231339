"""Output-speech quality evaluation: CER of synthesized speech through ASR.

Harness for the reference's output-speech CER table (BASELINE.md: "speech
decoder + pre-network" CER% at top-k 1..5 = 2.19 / 1.69 / 1.85 / 1.90 / 1.99,
assets/out_cer.png via README.md:54-58): each manifest sentence is synthesized
by the AR speech decoder + TiCodec vocoder conditioned on the LLM's
teacher-forced hidden states over that text (the decoder's training-time
conditioning, models/decoder/decoder.py:190-292), then transcribed back
through the streaming ASR pipeline and scored character-level against the
input text. With converted reference checkpoints this reproduces the
published evaluation; with random weights it validates the harness itself.

Manifest: one sentence per line (plain text).

Usage:
  python -m freeze_omni_tpu.bin.out_cer_eval --preset tiny \
      --manifest sents.txt --top_k 1,2,3,4,5 [--max_utts N]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np


def _text_hiddens(core, acfg, ids):
    """Teacher-forced last-layer LLM hidden states over the token ids:
    [1, len(ids), D] float32. Bucketed to limit compile count."""
    import jax
    import jax.numpy as jnp

    from ..models import qwen2
    from ..tts import bucket_pad

    @functools.partial(jax.jit, static_argnames=("cfg", "cap"))
    def fwd(params, cfg, embeds, mask, cap):
        cache = qwen2.init_cache(cfg, 1, max_len=cap,
                                 dtype=embeds.dtype)
        hidden, _ = qwen2.forward(params, cfg, embeds, mask, cache)
        return hidden

    emb = qwen2.embed_tokens(core.params["llm"], jnp.asarray(ids)[None])
    emb, mask = bucket_pad(np.asarray(emb, np.float32), 32)
    emb = emb.astype(core.user_prefix_embeds.dtype)
    hidden = fwd(core.params["llm"], acfg.llm, emb, mask,
                 int(emb.shape[1]) + 8)
    return np.asarray(hidden, np.float32)[:, : len(ids)]


def synthesize_text(pipeline, tts, cfg, text: str, top_k: int):
    """text -> 24 kHz PCM via the sentence-to-speech glue
    (bin/inference.py:82-92): post-process, re-embed with the LLM table,
    teacher-forced hidden states as the decoder prefix. Returns float32 PCM
    or None for empty text."""
    from ..models import qwen2

    core = pipeline.core
    ids = core.tokenizer.encode(pipeline.post_process(text))
    if not ids:
        return None
    dec_idim = cfg.tts.decoder.idim
    emb = qwen2.embed_tokens(core.params["llm"], np.asarray(ids, np.int32))
    emb = np.asarray(emb, np.float32).reshape(-1, dec_idim)[None]
    prefix = _text_hiddens(core, cfg.audio_llm, ids)
    prefix = prefix.reshape(-1, dec_idim)[None]
    segs = [s[0, 0] for s in tts.run(emb, prefix=prefix, top_k=top_k)]
    if not segs:
        return None
    return np.concatenate(segs)


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="output-speech CER harness")
    p.add_argument("--preset", default="flagship", choices=["tiny", "flagship"])
    p.add_argument("--model_path", default=None,
                   help="reference checkpoint dir (enables real-weight eval)")
    p.add_argument("--llm_path", default=None)
    p.add_argument("--quant", default=0, type=int, choices=[0, 8, 4])
    p.add_argument("--manifest", required=True,
                   help="one sentence per line")
    p.add_argument("--top_k", default="1,2,3,4,5",
                   help="comma-separated decoder top-k sweep "
                        "(the reference table's 1..5 columns)")
    p.add_argument("--max_utts", type=int, default=0)
    p.add_argument("--max_tokens", type=int, default=64,
                   help="ASR generation cap per utterance")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dump_wav_dir", default=None,
                   help="optionally save each synthesized wav here")
    args = p.parse_args(argv)

    from ..config import flagship_system, tiny_system
    from ..frontend.chunker import OfflineChunker
    from ..frontend.wav import resample, write_wav
    from ..pipeline import InferencePipeline
    from ..tts import StreamingTTS
    from ..utils.metrics import corpus_score
    from .asr_eval import transcribe

    tts_params = None
    if args.model_path:
        from ..utils.factory import (build_system_from_reference,
                                     is_native_system, load_native_system)

        if is_native_system(args.model_path):
            cfg, audiollm_params, tts_params, tokenizer = load_native_system(
                args.model_path)
        else:
            cfg, audiollm_params, tts_params, tokenizer = \
                build_system_from_reference(args.model_path, args.llm_path,
                                            quantize_llm_bits=args.quant or None)
        pipeline = InferencePipeline(cfg, params=audiollm_params,
                                     tokenizer=tokenizer, seed=args.seed)
    else:
        cfg = tiny_system() if args.preset == "tiny" else flagship_system()
        pipeline = InferencePipeline(cfg, seed=args.seed)
    if tts_params is None:
        import jax

        from ..models import codec as codec_mod
        from ..models import speech_decoder as sd

        k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed + 7))
        tts_params = {"decoder": sd.init_params(k1, cfg.tts.decoder),
                      "codec": codec_mod.init_params(k2, cfg.tts.codec)}
    tts = StreamingTTS(tts_params, cfg.tts, seed=args.seed)
    chunker = OfflineChunker(cfg.chunker)

    texts = []
    with open(args.manifest) as f:
        for line in f:
            line = line.strip()
            if line:
                texts.append(line)
            if args.max_utts and len(texts) >= args.max_utts:
                break

    top_ks = [int(k) for k in str(args.top_k).split(",") if k.strip()]
    by_top_k = {}
    for top_k in top_ks:
        pairs = []
        for i, text in enumerate(texts):
            pcm24 = synthesize_text(pipeline, tts, cfg, text, top_k)
            if pcm24 is None:
                continue
            if args.dump_wav_dir:
                import os

                os.makedirs(args.dump_wav_dir, exist_ok=True)
                write_wav(f"{args.dump_wav_dir}/k{top_k}_{i:04d}.wav",
                          pcm24.astype(np.float32),
                          cfg.tts.codec.sample_rate)
            wav16 = resample(pcm24, cfg.tts.codec.sample_rate, 16000)
            hyp = transcribe(pipeline, chunker, wav16, args.max_tokens)
            pairs.append((text, hyp))
            print(f"[k={top_k} {len(pairs)}/{len(texts)}] ref={text[:40]!r} "
                  f"hyp={hyp[:40]!r}", file=sys.stderr, flush=True)
        by_top_k[top_k] = 100.0 * corpus_score(pairs, char_level=True) \
            if pairs else float("nan")

    best = min((v for v in by_top_k.values() if v == v), default=float("nan"))
    print(json.dumps({"metric": "out_cer", "value": best, "unit": "%",
                      "by_top_k": {str(k): v for k, v in by_top_k.items()},
                      "n_utts": len(texts)}))
    return by_top_k


if __name__ == "__main__":
    main()
