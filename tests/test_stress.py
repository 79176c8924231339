"""Concurrency and failure-containment tests.

The reference's thread soup has no race detection (SURVEY.md §5); here the
engine's invariants are tested under concurrent producers and injected
failures.
"""

import threading
import time

import numpy as np
import pytest

from freeze_omni_tpu.config import tiny_system
from freeze_omni_tpu.duplex.engine import DuplexSession
from freeze_omni_tpu.duplex.events import EventSink
from freeze_omni_tpu.pipeline import DuplexPipeline
from freeze_omni_tpu.utils.queues import PCMQueue


class TestPCMQueueConcurrency:
    def test_concurrent_producers_consumer(self):
        q = PCMQueue()
        n_producers, chunks_each, chunk = 4, 50, 160
        stop = threading.Event()
        got = []

        def produce(seed):
            rng = np.random.RandomState(seed)
            for _ in range(chunks_each):
                q.push(rng.randn(chunk).astype(np.float32))

        def consume():
            while not stop.is_set() or q.available() >= chunk:
                out = q.pull(chunk)
                if out is None:
                    time.sleep(0.001)
                else:
                    got.append(out)

        threads = [threading.Thread(target=produce, args=(i,))
                   for i in range(n_producers)]
        consumer = threading.Thread(target=consume)
        consumer.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stop.set()
        consumer.join(timeout=5)
        assert len(got) == n_producers * chunks_each
        assert all(g.shape == (chunk,) for g in got)


class TestFailureContainment:
    def test_worker_survives_poisoned_predictor(self):
        cfg = tiny_system()
        sess = DuplexSession(DuplexPipeline(cfg, seed=0), cfg)
        errors = []
        sess.sink.on("error", lambda p: errors.append(p))

        # poison the pipeline once, then restore
        real = sess.pipeline.speech_dialogue
        calls = {"n": 0}

        def flaky(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected predictor failure")
            return real(*a, **kw)

        sess.pipeline.speech_dialogue = flaky
        sess.start(interval=0.005)
        n = cfg.duplex.gating.samples_per_chunk
        from freeze_omni_tpu.training.vad import synth_speech
        speech = 0.5 * synth_speech(np.random.RandomState(7), 3 * n)
        sess.enqueue_audio_data("user", {"audio": np.zeros(n, np.float32),
                                         "enc": "f32"})
        sess.enqueue_audio_data("user", {"audio": speech, "enc": "f32"})
        time.sleep(1.5)
        # inject more work after the failure: the worker must still be alive
        sess.enqueue_audio_data("user", {"audio": speech, "enc": "f32"})
        time.sleep(2.0)
        sess.release()

        assert any("injected predictor failure" in e["message"] for e in errors)
        # post-failure work was processed
        assert len(sess.sink.events_of("dialog_state_update")) >= 1


class TestCloseDuringTick:
    def test_sessions_closing_under_a_ticking_service(self):
        """Regression for the r2 review: sessions closing from another thread
        while the tick thread runs step() must never raise out of step() (a
        KeyError once killed the server's ticker permanently). Sessions churn
        open/close concurrently with continuous stepping + audio."""
        import threading

        from freeze_omni_tpu.config import tiny_system
        from freeze_omni_tpu.runtime.service import DuplexService

        cfg = tiny_system()
        svc = DuplexService(cfg, seed=0)
        n = cfg.duplex.gating.samples_per_chunk
        speech = np.random.RandomState(0).randn(3 * n).astype(np.float32) * 0.4

        stop = threading.Event()
        step_errors = []

        def ticker():
            while not stop.is_set():
                try:
                    svc.step()
                except Exception as e:  # any escape = the bug
                    step_errors.append(repr(e))
                    return

        t = threading.Thread(target=ticker)
        t.start()
        try:
            for round_i in range(12):
                sid = f"churn-{round_i % 2}"
                svc.open_session(sid)
                svc.enqueue_audio_data(sid, "user", {"audio": speech})
                time.sleep(0.05)  # let step() observe the session mid-work
                svc.close_session(sid)
        finally:
            stop.set()
            t.join(timeout=10)
        assert not step_errors, step_errors
