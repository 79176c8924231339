"""Spoken question-answering evaluation: accuracy/EM/F1 over a wav manifest.

Harness for the reference's spoken-QA benchmark rows (BASELINE.md: Web
Questions 44.73 / LlaMA Questions 72.0 / Audio Trivia QA 53.88 accuracy,
assets/qa.png via README.md:60-64). Listens to each spoken question through
the streaming pipeline, generates the text answer, scores against the gold
answers. With converted reference checkpoints this reproduces the published
evaluation; with random weights it validates the harness itself.

Manifest: tab-separated lines "path<TAB>answer" where answer may hold
alternatives separated by "|||".

Usage:
  python -m freeze_omni_tpu.bin.qa_eval --preset tiny --manifest qa.tsv \
      [--max_utts N] [--max_tokens N] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import sys

QA_ROLE = ("You are a helpful assistant. Answer the user's question "
           "concisely.")


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="spoken-QA evaluation harness")
    p.add_argument("--preset", default="flagship", choices=["tiny", "flagship"])
    p.add_argument("--model_path", default=None,
                   help="reference checkpoint dir (enables real-weight eval)")
    p.add_argument("--llm_path", default=None)
    p.add_argument("--quant", default=0, type=int, choices=[0, 8, 4])
    p.add_argument("--manifest", required=True,
                   help="tsv: wav_path<TAB>answer[ ||| alt ...] per line")
    p.add_argument("--max_utts", type=int, default=0)
    p.add_argument("--max_tokens", type=int, default=64)
    p.add_argument("--batch", type=int, default=0,
                   help="batched eval: B questions share every device step "
                        "(greedy decoding)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from ..config import flagship_system, tiny_system
    from ..frontend.chunker import OfflineChunker
    from ..frontend.wav import read_wav, resample
    from ..pipeline import InferencePipeline
    from ..utils.metrics import qa_contains, qa_exact_match, qa_f1
    from .asr_eval import batched_transcribe, transcribe

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

    utts = []
    with open(args.manifest) as f:
        for line in f:
            if not line.strip():
                continue
            path, ans = line.rstrip("\n").split("\t", 1)
            utts.append((path, [a.strip() for a in ans.split("|||")]))
            if args.max_utts and len(utts) >= args.max_utts:
                break

    def load(path):
        wav, sr = read_wav(path)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        if sr != 16000:
            wav = resample(wav, sr, 16000)
        return wav

    scored = []
    if args.batch > 1:
        for s in range(0, len(utts), args.batch):
            group = utts[s: s + args.batch]
            hyps = batched_transcribe(pipeline, cfg,
                                      [load(p) for p, _ in group],
                                      args.max_tokens, role=QA_ROLE)
            for (_, golds), hyp in zip(group, hyps):
                scored.append((golds, hyp))
                print(f"[{len(scored)}] gold={golds[0][:40]!r} "
                      f"hyp={hyp[:40]!r}", file=sys.stderr)
    else:
        for path, golds in utts:
            hyp = transcribe(pipeline, chunker, load(path), args.max_tokens,
                             role=QA_ROLE)
            scored.append((golds, hyp))
            print(f"[{len(scored)}] gold={golds[0][:40]!r} hyp={hyp[:40]!r}",
                  file=sys.stderr)

    n = max(1, len(scored))
    acc = sum(qa_contains(g, h) for g, h in scored) / n
    em = sum(qa_exact_match(g, h) for g, h in scored) / n
    f1 = sum(qa_f1(g, h) for g, h in scored) / n
    print(json.dumps({"metric": "qa_accuracy", "value": round(100 * acc, 2),
                      "unit": "%", "n_utts": len(scored),
                      "detail": {"exact_match": round(100 * em, 2),
                                 "f1": round(100 * f1, 2)}}))


if __name__ == "__main__":
    main()
