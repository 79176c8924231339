"""Headline benchmark: p50 speech-to-first-audio latency on one TPU chip.

Measures the reference's end-to-end latency breakdown (BASELINE.md /
assets/latency.png): from the moment the dialog engine decides to speak
("LLM interrupted") through assistant-prefix prefill + first text-token chunk,
speech-decoder prefill, the first codec token chunk, and the first PCM samples
out of the vocoder. Baseline p50 = 753 ms (reference GPU).

Runs the flagship architecture (Qwen2-7B feature dims) with a configurable
layer count (--layers) sized to the single chip; all steps are the same jitted
graphs the serving path uses. Prints ONE JSON line on stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA compilation cache: repeat bench runs skip the multi-minute
# warmup compiles
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BASELINE_P50_MS = 753.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def serving_bench(cfg, args, llm_dtype):
    """Concurrent duplex streams: every 224 ms tick, all N sessions submit a
    user chunk; measure the batched tick latency. Sustained serving requires
    tick p50 << 224 ms; headroom = how many more streams fit."""
    import dataclasses

    import jax.numpy as jnp

    from freeze_omni_tpu.runtime.engine import ServingEngine

    cfg = dataclasses.replace(
        cfg, serving=dataclasses.replace(cfg.serving,
                                         max_sessions=args.streams))
    t0 = time.time()
    engine = ServingEngine(cfg, seed=0, kv_dtype=llm_dtype)
    for i in range(args.streams):
        engine.open_session(f"s{i}")
    log(f"engine+sessions ready in {time.time()-t0:.1f}s")

    rng = np.random.RandomState(0)
    chunk = [rng.randn(1, 32, 80).astype(np.float32)
             for _ in range(args.streams)]

    def one_tick(is_sl):
        for i in range(args.streams):
            engine.submit_chunk(f"s{i}", "user", chunk[i], is_sl=is_sl)
        t = time.perf_counter()
        engine.tick()
        return (time.perf_counter() - t) * 1e3

    log("warmup/compile...")
    one_tick(True)
    one_tick(False)
    lat = [one_tick(False) for _ in range(args.trials * 3)]
    p50 = float(np.median(lat))
    chunk_ms = cfg.duplex.gating.chunk_duration_s * 1e3
    rtf = p50 / chunk_ms  # fraction of real time spent per tick
    log(f"tick latencies: {['%.1f' % x for x in lat]}")
    print(json.dumps({
        "metric": "duplex_streams_per_chip",
        "value": args.streams,
        "unit": "streams",
        "vs_baseline": round(rtf, 3),
        "detail": {
            "tick_p50_ms": round(p50, 1),
            "chunk_ms": chunk_ms,
            "realtime_fraction": round(rtf, 3),
            "llm_layers": cfg.audio_llm.llm.num_layers,
            "note": "vs_baseline = tick_p50/chunk (sustained iff < 1); "
                    "reference serves 1 replica per ~15GB GPU",
        },
    }))


def load_bench(cfg, args, llm_dtype):
    """Full production scenario: N duplex streams tick at the 224 ms cadence
    while fast responses fire on a rotating session every 3rd tick — measures
    whether prediction stays real-time WITH generation load on the same chip."""
    import dataclasses

    import jax.numpy as jnp

    from freeze_omni_tpu.models import codec as codec_mod
    from freeze_omni_tpu.models import speech_decoder as sd
    from freeze_omni_tpu.runtime.engine import ServingEngine

    cfg = dataclasses.replace(
        cfg, serving=dataclasses.replace(cfg.serving,
                                         max_sessions=args.streams))
    t0 = time.time()
    engine = ServingEngine(cfg, seed=0, kv_dtype=llm_dtype)
    for i in range(args.streams):
        engine.open_session(f"s{i}")
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    tts_params = {"decoder": sd.init_params(k1, cfg.tts.decoder),
                  "codec": codec_mod.init_params(k2, cfg.tts.codec)}
    log(f"engine+sessions ready in {time.time()-t0:.1f}s")

    rng = np.random.RandomState(0)
    chunk = [rng.randn(1, 32, 80).astype(np.float32)
             for _ in range(args.streams)]

    def tick(is_sl):
        for i in range(args.streams):
            engine.submit_chunk(f"s{i}", "user", chunk[i], is_sl=is_sl)
        t = time.perf_counter()
        engine.tick()
        return (time.perf_counter() - t) * 1e3

    log("warmup/compile...")
    tick(True)
    engine.respond_fast("s0", tts_params, n_text=args.sentence_tokens - 1)
    log(f"warmup done in {time.time()-t0:.1f}s")

    tick_lat, resp_lat = [], []
    n_ticks = max(args.trials * 3, 9)
    for i in range(n_ticks):
        tick_lat.append(tick(False))
        if i % 3 == 2:
            sid = f"s{(i // 3) % args.streams}"
            t = time.perf_counter()
            engine.respond_fast(sid, tts_params,
                                n_text=args.sentence_tokens - 1)
            resp_lat.append((time.perf_counter() - t) * 1e3)
    p50_tick = float(np.median(tick_lat))
    p50_resp = float(np.median(resp_lat))
    chunk_ms = cfg.duplex.gating.chunk_duration_s * 1e3
    # a responding tick must still fit the budget: tick + response share it
    worst = p50_tick + p50_resp
    log(f"ticks: {['%.0f' % x for x in tick_lat]}")
    log(f"responses: {['%.0f' % x for x in resp_lat]}")
    print(json.dumps({
        "metric": "duplex_load_realtime_fraction",
        "value": round(worst / chunk_ms, 3),
        "unit": "fraction",
        "vs_baseline": round(worst / chunk_ms, 3),
        "detail": {
            "streams": args.streams,
            "tick_p50_ms": round(p50_tick, 1),
            "fast_response_p50_ms": round(p50_resp, 1),
            "chunk_ms": chunk_ms,
            "llm_layers": cfg.audio_llm.llm.num_layers,
            "note": "worst-case single tick (prediction + one complete fast "
                    "response) over the 224ms budget. In deployment the "
                    "response overlaps subsequent ticks (the user has stopped "
                    "speaking), so sustained operation requires tick_p50 < "
                    "budget (holds) and the response only adds one-time "
                    "speak latency.",
        },
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=12,
                   help="LLM layer count (flagship=28; default sized for the "
                        "16GB v5e chip alongside XLA workspace)")
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--sentence_tokens", type=int, default=8,
                   help="text tokens before first sentence boundary")
    p.add_argument("--preset", default="bench", choices=["bench", "tiny"])
    p.add_argument("--mode", default="latency",
                   choices=["latency", "serving", "load"])
    p.add_argument("--streams", type=int, default=8,
                   help="concurrent duplex sessions for --mode serving")
    p.add_argument("--quant", action="store_true",
                   help="int8 weight-only LLM (fits all 28 layers on 16GB)")
    args = p.parse_args()

    from freeze_omni_tpu.config import (LLMConfig, SamplingConfig, flagship_system,
                                        tiny_system)
    from freeze_omni_tpu.models import audio_llm, codec as codec_mod, qwen2
    from freeze_omni_tpu.models import speech_decoder as sd
    from freeze_omni_tpu.tts import StreamingTTS

    if args.preset == "tiny":
        cfg = tiny_system()
        llm_dtype = jnp.float32
    else:
        cfg = flagship_system()
        cfg = dataclasses.replace(
            cfg, audio_llm=dataclasses.replace(
                cfg.audio_llm,
                llm=dataclasses.replace(cfg.audio_llm.llm,
                                        num_layers=args.layers,
                                        max_kv_len=1024)))
        llm_dtype = jnp.bfloat16

    acfg = cfg.audio_llm
    log(f"devices: {jax.devices()}")
    log(f"init: llm layers={acfg.llm.num_layers} hidden={acfg.llm.hidden} "
        f"dtype={llm_dtype.__name__}")

    if args.mode == "serving":
        serving_bench(cfg, args, llm_dtype)
        return
    if args.mode == "load":
        load_bench(cfg, args, llm_dtype)
        return

    t0 = time.time()
    params = audio_llm.init_params(jax.random.PRNGKey(0), acfg,
                                   llm_dtype=llm_dtype)
    if args.quant:
        from freeze_omni_tpu.ops.quant import quantize_llm_params

        params["llm"] = jax.block_until_ready(
            quantize_llm_params(params["llm"]))
        log("LLM weights quantized to int8 (layers + embeddings)")
    # the latency bench only exercises the user identity: alias the system
    # copies (immutable arrays -> no extra HBM)
    params["encoder_system"] = params["encoder_user"]
    params["adapter_system"] = params["adapter_user"]
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    tts_params = {"decoder": sd.init_params(k1, cfg.tts.decoder),
                  "codec": codec_mod.init_params(k2, cfg.tts.codec)}
    jax.block_until_ready(params)
    log(f"params ready in {time.time()-t0:.1f}s")

    # random weights produce noise PCM, so the content-dependent seam gate
    # (llm2tts.py:106-112) would arbitrarily delay the first yield; force
    # first-chunk emission to measure pure pipeline latency
    tts = StreamingTTS(tts_params,
                       dataclasses.replace(cfg.tts, seam_threshold=1e9), seed=0)
    sampling = cfg.sampling

    prefill_generate = jax.jit(
        audio_llm.prefill_and_generate,
        static_argnames=("cfg", "sampling", "n_steps", "eod_id"))

    # fixture: a duplex session mid-conversation
    kv = qwen2.init_cache(acfg.llm, 1, dtype=llm_dtype)
    role_ids = jnp.arange(24)[None] % acfg.llm.vocab_size
    kv = jax.jit(audio_llm.prefill_tokens, static_argnames=("cfg",))(
        params, acfg, role_ids, kv)
    caches = audio_llm.init_session(acfg, 1, kv_dtype=llm_dtype)._replace(kv=kv)
    assistant_ids = (jnp.arange(6)[None] + 3) % acfg.llm.vocab_size

    dec_idim = cfg.tts.decoder.idim
    factor = acfg.llm.hidden // dec_idim

    # single-dispatch fast path: the tunneled chip pays ~55ms per host sync,
    # so one fused program is the latency-optimal first response
    from freeze_omni_tpu.runtime import fastpath

    gt = jnp.asarray(np.array(cfg.tts.codec.global_tokens, np.int32)[None, None])

    def fast_trial(caches, key):
        t_start = time.perf_counter()
        pcm, toks, done, ctoks, kv2 = fastpath.first_response(
            params, tts_params, acfg, cfg.tts.decoder, cfg.tts.codec,
            assistant_ids, caches.kv, key, sampling,
            n_text=args.sentence_tokens - 1,
            n_codec=cfg.tts.codec_chunk_size + cfg.tts.codec_padding_size,
            top_k=2, eod_id=-1, global_tokens=gt)
        np.asarray(pcm)  # the single host sync
        return (time.perf_counter() - t_start) * 1e3

    def one_trial(caches, key, timed: bool):
        t_start = time.perf_counter()
        marks = {}
        # a+b) assistant-prefix prefill + first text chunk: ONE dispatch
        toks, hiddens, done, kv2 = prefill_generate(
            params, acfg, assistant_ids, caches.kv, key, sampling,
            n_steps=args.sentence_tokens - 1, eod_id=-1)
        tok_ids = np.asarray(toks)[0]
        hiddens = np.asarray(hiddens, np.float32)
        marks["first_text_chunk_ms"] = (time.perf_counter() - t_start) * 1e3
        # c) speech decoder + codec to first PCM (one fused dispatch inside)
        text_emb = qwen2.embed_tokens(params["llm"], jnp.asarray(tok_ids)[None])
        text_emb = np.asarray(text_emb, np.float32).reshape(-1, dec_idim)[None]
        prefix = hiddens.reshape(-1, dec_idim)[None]
        for seg in tts.run(text_emb, prefix=prefix, top_k=2):
            first_pcm = seg
            break
        marks["first_pcm_ms"] = (time.perf_counter() - t_start) * 1e3
        return marks

    # warmup (compile all graphs used by the timed paths)
    log("warmup/compile...")
    t0 = time.time()
    one_trial(caches, jax.random.PRNGKey(100), timed=False)
    fast_trial(caches, jax.random.PRNGKey(101))
    log(f"warmup done in {time.time()-t0:.1f}s")

    lat = []
    fast_lat = []
    for i in range(args.trials):
        m = one_trial(caches, jax.random.PRNGKey(200 + i), timed=True)
        f_ms = fast_trial(caches, jax.random.PRNGKey(300 + i))
        lat.append(m)
        fast_lat.append(f_ms)
        log(f"trial {i}: first_text={m['first_text_chunk_ms']:.1f}ms "
            f"first_pcm={m['first_pcm_ms']:.1f}ms fused={f_ms:.1f}ms")

    p50_staged = float(np.median([m["first_pcm_ms"] for m in lat]))
    p50_fused = float(np.median(fast_lat))
    p50 = min(p50_staged, p50_fused)
    p50_text = float(np.median([m["first_text_chunk_ms"] for m in lat]))
    print(json.dumps({
        "metric": "p50_speech_to_first_audio",
        "value": round(p50, 1),
        "unit": "ms",
        "vs_baseline": round(p50 / BASELINE_P50_MS, 3),
        "detail": {
            "p50_first_text_chunk_ms": round(p50_text, 1),
            "p50_staged_ms": round(p50_staged, 1),
            "p50_fused_single_dispatch_ms": round(p50_fused, 1),
            "baseline_p50_ms": BASELINE_P50_MS,
            "llm_layers": acfg.llm.num_layers,
            "note": "vs_baseline = ours/reference (<1 is faster); fused = "
                    "one-dispatch first response (runtime/fastpath.py)",
        },
    }))


if __name__ == "__main__":
    main()
