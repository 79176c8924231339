"""Offline single-turn speech-to-speech CLI: wav in -> wav out.

Parity with bin/inference.py:94-187 (upstream semantics, with the text
generation loop the fork removed): listen chunk-by-chunk, force 'dialog_ss',
generate text with sentence-boundary segmentation, synthesize each sentence
through the AR speech decoder + codec, write 24 kHz audio.

Usage:
  python -m freeze_omni_tpu.bin.offline_infer --preset tiny \
      --input_wav in.wav --output_wav out.wav [--model_path CKPT --llm_path LLM]
"""

from __future__ import annotations

import argparse
import math

import jax
import numpy as np

from ..config import SystemConfig, flagship_system, tiny_system
from ..frontend.chunker import OfflineChunker
from ..frontend.wav import read_wav, resample, write_wav
from ..models import qwen2
from ..pipeline import InferencePipeline
from ..tts import StreamingTTS
from ..utils.logging import span, span_report

SENTENCE_SUFFIXES = ("。", "：", "？", "！", ".", "?", "!", "\n")


def get_args():
    p = argparse.ArgumentParser(description="freeze-omni-tpu offline inference")
    p.add_argument("--preset", default="flagship", choices=["tiny", "flagship"])
    p.add_argument("--model_path", default=None, help="checkpoint dir (optional)")
    p.add_argument("--llm_path", default=None, help="LLM dir (optional)")
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--top_p", type=float, default=0.8)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--input_wav", required=True)
    p.add_argument("--output_wav", required=True)
    p.add_argument("--max_tokens", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--voice_wav", default=None,
                   help="voice prompt: reference wav whose TiCodec global "
                        "style tokens condition the synthesized speech "
                        "(requires codec params with the encoder branch)")
    return p.parse_args()


def synthesize_sentence(pipeline: InferencePipeline, tts: StreamingTTS,
                        hidden_states, text: str, wav_out: list,
                        decoder_topk: int = 2):
    """The sentence-to-speech glue (bin/inference.py:82-92): post-process the
    text, re-embed it with the LLM embedding table, view both the embeddings
    and the collected hidden states as idim-wide frames, and stream PCM."""
    core = pipeline.core
    dec_idim = tts.cfg.decoder.idim
    text_p = pipeline.post_process(text)
    ids = core.tokenizer.encode(text_p)
    if not ids:
        return
    emb = qwen2.embed_tokens(core.params["llm"], np.asarray(ids))
    emb = np.asarray(emb, np.float32).reshape(-1, dec_idim)[None]
    prefix = np.concatenate(hidden_states, axis=1)  # [1, n, D]
    prefix = np.asarray(prefix, np.float32).reshape(-1, dec_idim)[None]
    for seg in tts.run(emb, prefix=prefix, top_k=decoder_topk):
        wav_out.append(seg[0, 0])


def run_inference(cfg: SystemConfig, args, pipeline=None, tts_params=None):
    with span("init"):
        model_path = getattr(args, "model_path", None)
        if pipeline is None and model_path:
            # converted reference checkpoints (utils/factory.py)
            from ..utils.factory import build_system_from_reference

            cfg, audiollm_params, tts_params, tokenizer = \
                build_system_from_reference(model_path, args.llm_path)
            pipeline = InferencePipeline(cfg, params=audiollm_params,
                                         tokenizer=tokenizer, seed=args.seed)
        if pipeline is None:
            pipeline = InferencePipeline(cfg, seed=args.seed)
        if tts_params is None:
            from ..models import codec as codec_mod
            from ..models import speech_decoder as sd
            k = jax.random.PRNGKey(args.seed + 7)
            k1, k2 = jax.random.split(k)
            tts_params = {"decoder": sd.init_params(k1, cfg.tts.decoder),
                          "codec": codec_mod.init_params(
                              k2, cfg.tts.codec,
                              with_encoder=bool(
                                  getattr(args, "voice_wav", None)))}
        tts = StreamingTTS(tts_params, cfg.tts, seed=args.seed)
        if getattr(args, "voice_wav", None):
            from ..tts import extract_global_tokens
            vwav, vsr = read_wav(args.voice_wav)
            if vwav.ndim > 1:
                vwav = vwav.mean(axis=1)
            gst = extract_global_tokens(tts_params["codec"], cfg.tts.codec,
                                        vwav, vsr)
            tts.set_global_tokens(gst)
            print(f"voice prompt: global tokens {gst}")
        chunker = OfflineChunker(cfg.chunker)

    with span("read_audio"):
        wav, fs = read_wav(args.input_wav)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        if fs != 16000:
            wav = resample(wav, fs, 16000)

    # Stage 0: system-role prefill
    with span("pre"):
        outputs = pipeline.speech_dialogue(
            None, stat="pre", role="You are a helpful assistant.")

    # Stage 1: listen
    chunk = chunker.get_chunk_size()
    n = int(math.ceil(len(wav) / chunk)) * chunk
    padded = np.zeros(n, np.float32)
    padded[: len(wav)] = wav
    with span("listen"):
        for i in range(0, n, chunk):
            fbank = chunker.process(padded[i : i + chunk])
            outputs = pipeline.speech_dialogue(fbank, **outputs)
            outputs["stat"] = "dialog_cl"
    chunker.reset()

    # Stage 2: reset audio caches, force speak
    outputs["adapter_cache"] = None
    outputs["encoder_cache"] = None
    outputs["stat"] = "dialog_ss"

    # Stage 3/4: generate text in on-device segments, synthesize per sentence
    wav_segments: list = []
    with span("generate"):
        outputs = pipeline.speech_dialogue(None, **outputs)  # 'dialog_ss'
        tok = pipeline.core.tokenizer
        cur_hidden = [outputs["hidden_state"]]
        cur_tokens = list(outputs["past_tokens"])
        whole_tokens = list(outputs["past_tokens"])

        def flush():
            nonlocal cur_hidden, cur_tokens
            text = tok.decode([t for t in cur_tokens if t != tok.eod_id])
            if text.strip() and cur_hidden:
                with span("synthesize"):
                    synthesize_sentence(pipeline, tts, cur_hidden, text,
                                        wav_segments)
            cur_hidden, cur_tokens = [], []

        while outputs["stat"] == "dialog_cs" and \
                len(outputs["past_tokens"]) <= args.max_tokens:
            outputs = pipeline.speech_dialogue_segment(outputs, n_steps=16)
            seg_toks = outputs["segment_tokens"]
            seg_hid = outputs["segment_hiddens"]  # [1, k, D]
            whole_tokens += seg_toks
            # host-side sentence-boundary scan over the segment
            # (bin/inference.py:160-174 semantics, token-aligned)
            for j, t in enumerate(seg_toks):
                cur_tokens.append(t)
                cur_hidden.append(seg_hid[:, j : j + 1])
                piece = tok.decode([t]) if t != tok.eod_id else ""
                if piece.endswith(SENTENCE_SUFFIXES):
                    prev = tok.decode(cur_tokens[:-1])
                    if not (piece.endswith(".") and prev[-1:].isdigit()):
                        flush()
        flush()
        whole_text = tok.decode([t for t in whole_tokens if t != tok.eod_id])

    with span("write_audio"):
        out = (np.concatenate(wav_segments) if wav_segments
               else np.zeros(1, np.float32))
        write_wav(args.output_wav, out, cfg.tts.codec.sample_rate)

    print("text:", whole_text)
    print(span_report())
    return whole_text, out


def main():
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = get_args()
    cfg = tiny_system() if args.preset == "tiny" else flagship_system()
    import dataclasses
    cfg = dataclasses.replace(
        cfg, sampling=dataclasses.replace(cfg.sampling, top_k=args.top_k,
                                          top_p=args.top_p,
                                          temperature=args.temperature))
    run_inference(cfg, args)


if __name__ == "__main__":
    main()
