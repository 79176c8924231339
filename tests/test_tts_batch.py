"""Batched sentence-synthesis pool (runtime/tts_batch) — VERDICT r3 #3.

The per-session StreamingTTS.run host loop is replaced by a resident pool:
one fused decode dispatch advances every in-flight sentence per tick. The
streaming semantics (chunk + look-ahead windows, left/right trim, seam
splice — llm2tts.py:114-160) must be preserved exactly, so the core parity
test drives both paths GREEDILY (top_k=1): the AR token stream is then
segmentation-invariant and the PCM must match sample-for-sample.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from freeze_omni_tpu.config import tiny_system
from freeze_omni_tpu.models import codec as codec_mod
from freeze_omni_tpu.models import speech_decoder as sd
from freeze_omni_tpu.runtime.tts_batch import BatchedTTS
from freeze_omni_tpu.tts import StreamingTTS


def _setup(top_k=1, max_tokens=48):
    cfg = dataclasses.replace(tiny_system().tts, top_k=top_k,
                              max_tokens=max_tokens)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {"decoder": sd.init_params(k1, cfg.decoder),
              "codec": codec_mod.init_params(k2, cfg.codec)}
    return cfg, params


def _run_pool(pool, jobs):
    """Drive the pool to completion; returns {key: concatenated pcm}."""
    assert pool.start(jobs) == len(jobs)
    chunks = {}
    for _ in range(200):
        out = pool.step()
        for key, lst in out.items():
            for pcm, final in lst:
                chunks.setdefault(key, []).append(pcm)
        if pool.n_active == 0:
            break
    assert pool.n_active == 0, "pool did not drain"
    return {k: np.concatenate(v, axis=-1) for k, v in chunks.items()}


class TestBatchedTTSParity:
    def test_single_job_matches_streaming_tts(self):
        """Greedy: pooled synthesis must reproduce StreamingTTS.run PCM
        sample-for-sample (same windows, same seam splices)."""
        cfg, params = _setup()
        rng = np.random.RandomState(0)
        hidden = rng.randn(1, 7, cfg.decoder.idim).astype(np.float32)
        prefix = rng.randn(1, 3, cfg.decoder.idim).astype(np.float32)

        ref_tts = StreamingTTS(params, cfg, seed=0)
        ref = np.concatenate(
            [s for s in ref_tts.run(hidden, prefix=prefix)], axis=-1)

        pool = BatchedTTS(params, cfg, capacity=2, seed=0)
        got = _run_pool(pool, [("a", hidden, prefix)])["a"]
        assert ref.shape == got.shape, (ref.shape, got.shape)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_batching_does_not_change_a_jobs_output(self):
        """A sentence synthesized alongside 2 other jobs must produce the
        same PCM as synthesized alone (rows are independent)."""
        cfg, params = _setup()
        rng = np.random.RandomState(1)
        mk = lambda t: (rng.randn(1, t, cfg.decoder.idim).astype(np.float32),
                        rng.randn(1, 2, cfg.decoder.idim).astype(np.float32))
        h0, p0 = mk(6)
        h1, p1 = mk(9)
        h2, p2 = mk(4)

        solo = _run_pool(BatchedTTS(params, cfg, capacity=1, seed=0),
                         [("x", h0, p0)])["x"]
        batch = _run_pool(BatchedTTS(params, cfg, capacity=4, seed=0),
                          [("x", h0, p0), ("y", h1, p1), ("z", h2, p2)])
        assert set(batch) >= {"x"}
        np.testing.assert_allclose(batch["x"], solo, rtol=1e-4, atol=1e-4)

    def test_staggered_starts_and_cancel(self):
        """Jobs starting on different ticks share the pool; cancel frees the
        row mid-flight and the other job still completes."""
        cfg, params = _setup(max_tokens=64)
        rng = np.random.RandomState(2)
        h0 = rng.randn(1, 6, cfg.decoder.idim).astype(np.float32)
        h1 = rng.randn(1, 6, cfg.decoder.idim).astype(np.float32)
        pool = BatchedTTS(params, cfg, capacity=2, seed=0)
        assert pool.start([("a", h0, None)]) == 1
        pool.step()
        assert pool.start([("b", h1, None)]) == 1
        assert pool.n_active >= 1
        pool.cancel("a")
        assert all(j.key != "a" for j in pool.jobs.values())
        got = {}
        for _ in range(200):
            for key, lst in pool.step().items():
                got.setdefault(key, []).extend(lst)
            if pool.n_active == 0:
                break
        assert "a" not in got
        # b either emitted audio or legitimately stopped at an early eos
        assert pool.n_active == 0

    def test_warmup_covers_steady_state_shapes(self):
        """After warmup(), driving the pool end-to-end — starts at several
        batch sizes (with and without prefix), pooled decode steps, steady
        windows, final flushes, refills after frees — must trigger ZERO new
        XLA compiles. That is warmup's whole contract: no flagship-size
        compile ever lands on the service tick thread mid-conversation."""
        cfg, params = _setup(max_tokens=48)
        pool = BatchedTTS(params, cfg, capacity=4, seed=0)
        assert pool.warmup() > 0
        fns = {"preamble": pool._preamble,
               "preamble_noprefix": pool._preamble_noprefix,
               "decode": pool._decode, "vocode": pool._vocode,
               "scatter": pool._scatter}
        before = {k: f._cache_size() for k, f in fns.items()}
        rng = np.random.RandomState(4)

        def mk(t):
            return rng.randn(1, t, cfg.decoder.idim).astype(np.float32)

        assert pool.start([("a", mk(6), mk(3))]) == 1
        for _ in range(3):
            pool.step()
        assert pool.start([("b", mk(5), None), ("c", mk(7), mk(2)),
                           ("d", mk(4), mk(4))]) == 3
        for _ in range(200):
            pool.step()
            if pool.n_active == 0:
                break
        assert pool.n_active == 0
        after = {k: f._cache_size() for k, f in fns.items()}
        assert after == before, \
            f"steady state compiled new programs: {before} -> {after}"

    def test_capacity_limit(self):
        cfg, params = _setup()
        rng = np.random.RandomState(3)
        jobs = [(i, rng.randn(1, 5, cfg.decoder.idim).astype(np.float32),
                 None) for i in range(4)]
        pool = BatchedTTS(params, cfg, capacity=2, seed=0)
        assert pool.start(jobs) == 2
        assert pool.n_free == 0

    def test_immediate_eos_emits_final_marker(self):
        """A job whose FIRST sampled token is eos must still deliver a
        (pcm, final=True) entry — the service clears fe.tts_key only on a
        final entry; a silent finish would block that session's synthesis
        forever (ADVICE r4 medium #1)."""
        cfg, params = _setup()
        rng = np.random.RandomState(5)
        hidden = rng.randn(1, 5, cfg.decoder.idim).astype(np.float32)
        pool = BatchedTTS(params, cfg, capacity=2, seed=0)
        assert pool.start([("k", hidden, None)]) == 1
        row = next(iter(pool.jobs))
        toks = np.full((pool.capacity, 4), cfg.decoder.eos_id, np.int32)
        out = pool._deliver_step(toks, list(pool.jobs.items()))
        assert "k" in out, "immediate-eos job delivered no final marker"
        pcm, final = out["k"][-1]
        assert final and pcm.size == 0
        assert pool.n_active == 0 and row in pool._free

    def test_pre_eos_window_extracts_before_flush(self):
        """Tokens completing a full steady window in the same step as eos
        must come out as a steady window + small flush: window boundaries
        depend on token COUNT alone (tts.py run loop), and a flush larger
        than left+chunk+right would fall outside the warmup() vocoder shape
        closure (ADVICE r4 medium #2)."""
        cfg, params = _setup()
        cfg = dataclasses.replace(cfg, seam_threshold=1e9)  # force emission
        rng = np.random.RandomState(6)
        hidden = rng.randn(1, 5, cfg.decoder.idim).astype(np.float32)
        pool = BatchedTTS(params, cfg, capacity=1, seed=0)
        assert pool.start([("k", hidden, None)]) == 1
        job = next(iter(pool.jobs.values()))
        chunk, pad = cfg.codec_chunk_size, cfg.codec_padding_size
        window = job.left + chunk + job.right
        # one full window of valid tokens, then eos in the SAME step
        t = np.full((pool.capacity, window + 3), 1, np.int32)
        t[:, window] = cfg.decoder.eos_id
        out = pool._deliver_step(t, list(pool.jobs.items()))
        entries = out["k"]
        assert entries[-1][1] is True
        assert len(entries) == 2, "steady window was not extracted pre-eos"
        # flush holds only the window overlap (new_left + right tokens)
        up = cfg.codec.upsample_rate
        assert entries[-1][0].shape[-1] <= (2 * pad) * up + \
            entries[0][0].shape[-1]  # seam buffer + <=2*pad tokens of audio
        assert pool.n_active == 0

    def test_max_tokens_budget_is_exact(self):
        """Tokens past cfg.max_tokens must never reach the buffer
        (StreamingTTS clamps n_steps to the remaining budget — ADVICE r4
        low #2)."""
        cfg, params = _setup(max_tokens=17)
        rng = np.random.RandomState(7)
        hidden = rng.randn(1, 5, cfg.decoder.idim).astype(np.float32)
        pool = BatchedTTS(params, cfg, capacity=1, seed=0)
        assert pool.start([("k", hidden, None)]) == 1
        job = next(iter(pool.jobs.values()))
        t = np.full((pool.capacity, 10), 1, np.int32)  # never eos
        pool._deliver_step(t, list(pool.jobs.items()))
        assert job.total == 10 and not job.done_decode
        pool._deliver_step(t, [(job.row, job)])
        assert job.total == 17, "budget overshoot"
        assert job.finished and pool.n_active == 0


class TestServiceBatchedTTS:
    def _service(self, threshold=0.0):
        from freeze_omni_tpu.runtime.service import DuplexService

        sys_cfg = tiny_system()
        sys_cfg = dataclasses.replace(
            sys_cfg,
            tts=dataclasses.replace(sys_cfg.tts, top_k=1, max_tokens=32),
            duplex=dataclasses.replace(sys_cfg.duplex,
                                       resp_threshold=threshold),
            serving=dataclasses.replace(sys_cfg.serving, max_sessions=2))
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        tts_params = {"decoder": sd.init_params(k1, sys_cfg.tts.decoder),
                      "codec": codec_mod.init_params(k2, sys_cfg.tts.codec)}
        return DuplexService(sys_cfg, seed=0, tts_params=tts_params), sys_cfg

    def test_sentences_flow_through_pool(self):
        svc, cfg = self._service()
        sink = svc.open_session("s1")
        fe = svc.sessions["s1"]
        # queue a sentence directly (the continuation path calls
        # _emit_sentence exactly like this)
        hid = np.random.RandomState(0).randn(
            1, 1, cfg.tts.decoder.idim).astype(np.float32)
        svc._emit_sentence(fe, [5, 6, 7], [hid, hid, hid])
        texts = sink.events_of("response_text")
        assert texts, "text should emit at enqueue"
        svc.flush_tts()
        audio = sink.events_of("response_audio")
        assert audio, "pooled synthesis emitted no audio"
        assert all(a["sr"] == 16000 for a in audio)

    def test_barge_in_cancels_pool_job(self):
        svc, cfg = self._service()
        svc.open_session("s1")
        fe = svc.sessions["s1"]
        hid = np.random.RandomState(0).randn(
            1, 1, cfg.tts.decoder.idim).astype(np.float32)
        svc._emit_sentence(fe, [5, 6, 7], [hid])
        svc._advance_tts()  # job starts (and may begin decoding)
        assert fe.tts_key is not None or fe.tts_queue
        key = fe.tts_key
        # simulate the barge-in branch of _vad_stage
        fe.resp = None
        if key is not None:
            svc._tts.cancel(key)
        fe.tts_key = None
        fe.tts_queue.clear()
        fe.resp_gen += 1
        assert svc._tts.n_active == 0
        svc.flush_tts()
