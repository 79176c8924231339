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


def transcribe(pipeline, chunker, wav: np.ndarray, max_tokens: int) -> str:
    """Listen chunk-by-chunk then generate text (offline stage machine)."""
    outputs = pipeline.speech_dialogue(
        None, stat="pre",
        role="Transcribe the user's speech exactly.")
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


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="CER/WER evaluation harness")
    p.add_argument("--preset", default="flagship", choices=["tiny", "flagship"])
    p.add_argument("--model_path", default=None,
                   help="reference checkpoint dir (enables real-weight eval)")
    p.add_argument("--llm_path", default=None)
    p.add_argument("--manifest", required=True,
                   help="tsv: wav_path<TAB>transcript per line")
    p.add_argument("--char_level", action="store_true",
                   help="score CER instead of WER")
    p.add_argument("--max_utts", type=int, default=0)
    p.add_argument("--max_tokens", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from ..config import flagship_system, tiny_system
    from ..frontend.chunker import OfflineChunker
    from ..frontend.wav import read_wav, resample
    from ..pipeline import InferencePipeline
    from ..utils.metrics import corpus_score

    if args.model_path:
        from ..utils.factory import build_system_from_reference

        cfg, audiollm_params, _, tokenizer = build_system_from_reference(
            args.model_path, args.llm_path)
        pipeline = InferencePipeline(cfg, params=audiollm_params,
                                     tokenizer=tokenizer, seed=args.seed)
    else:
        cfg = tiny_system() if args.preset == "tiny" else flagship_system()
        pipeline = InferencePipeline(cfg, seed=args.seed)
    chunker = OfflineChunker(cfg.chunker)

    pairs = []
    with open(args.manifest) as f:
        for line in f:
            if not line.strip():
                continue
            path, ref = line.rstrip("\n").split("\t", 1)
            wav, sr = read_wav(path)
            if wav.ndim > 1:
                wav = wav.mean(axis=1)
            if sr != 16000:
                wav = resample(wav, sr, 16000)
            hyp = transcribe(pipeline, chunker, wav, args.max_tokens)
            pairs.append((ref, hyp))
            print(f"[{len(pairs)}] ref={ref[:40]!r} hyp={hyp[:40]!r}",
                  file=sys.stderr)
            if args.max_utts and len(pairs) >= args.max_utts:
                break

    score = corpus_score(pairs, char_level=args.char_level)
    metric = "cer" if args.char_level else "wer"
    print(json.dumps({"metric": metric, "value": round(100 * score, 2),
                      "unit": "%", "n_utts": len(pairs)}))


if __name__ == "__main__":
    main()
