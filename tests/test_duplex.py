import numpy as np
import pytest

from freeze_omni_tpu.config import VADConfig, tiny_system
from freeze_omni_tpu.duplex.engine import DuplexSession
from freeze_omni_tpu.duplex.events import EventSink
from freeze_omni_tpu.duplex.ipu import IPUHandle
from freeze_omni_tpu.duplex.serializer import ContextSerializer
from freeze_omni_tpu.duplex.vad import EnergyVAD
from freeze_omni_tpu.pipeline import DuplexPipeline
from freeze_omni_tpu.utils.queues import PCMQueue, ThreadSafeQueue


class TestEnergyVAD:
    def test_ipu_lifecycle(self):
        cfg = VADConfig(chunk_size=512, min_silence_s=0.064,  # 2 chunks
                min_speech_s=0.0)  # immediate onset: lifecycle,
        # not debounce, is under test here (debounce: test_vad.py)
        vad = EnergyVAD(cfg)
        loud = 0.5 * np.sin(2 * np.pi * 440 * np.arange(512) / 16000)
        quiet = np.zeros(512, np.float32)

        # establish noise floor
        for _ in range(5):
            out = vad.predict({"audio": quiet, "time_stamp": 0.0})
            assert out["status"] is None

        out = vad.predict({"audio": loud, "time_stamp": 1.0})
        assert out["status"] == "ipu_sl"
        assert len(out["cached_audio"]) <= cfg.history_cache_chunks

        out = vad.predict({"audio": loud, "time_stamp": 2.0})
        assert out["status"] == "ipu_cl"

        out = vad.predict({"audio": quiet, "time_stamp": 3.0})
        assert out["status"] == "ipu_cl"  # hangover
        out = vad.predict({"audio": quiet, "time_stamp": 4.0})
        assert out["status"] == "ipu_el"
        out = vad.predict({"audio": quiet, "time_stamp": 5.0})
        assert out["status"] is None


class TestSerializer:
    def test_user_priority_and_pseudo_ipu(self):
        s = ContextSerializer()
        s.add_feature_chunk({"time_stamp": 1.0, "identity": "user",
                             "status": "ipu_sl", "feature": "u1", "ipu_id": 1})
        s.add_feature_chunk({"time_stamp": 2.0, "identity": "system",
                             "status": "ipu_cl", "feature": "s1", "ipu_id": 2})
        s.add_feature_chunk({"time_stamp": 3.0, "identity": "user",
                             "status": "ipu_el", "feature": "u2", "ipu_id": 1})
        s.add_feature_chunk({"time_stamp": 4.0, "identity": "system",
                             "status": "ipu_cl", "feature": "s2", "ipu_id": 2})
        s.add_feature_chunk({"time_stamp": 5.0, "identity": "system",
                             "status": "ipu_cl", "feature": "s3", "ipu_id": 2})

        out = [s.get_next_feature() for _ in range(5)]
        # u1 passes; s1 dropped (user in IPU); u2 passes; s2 forced ipu_sl
        # (first of pseudo-IPU); s3 stays ipu_cl
        assert out[0]["feature"] == "u1"
        assert out[1] is None
        assert out[2]["feature"] == "u2"
        assert out[3]["feature"] == "s2" and out[3]["status"] == "ipu_sl"
        assert out[4]["feature"] == "s3" and out[4]["status"] == "ipu_cl"

    def test_timestamp_ordering(self):
        s = ContextSerializer()
        s.add_feature_chunk({"time_stamp": 2.0, "identity": "user",
                             "status": "ipu_cl", "feature": "b", "ipu_id": 1})
        s.add_feature_chunk({"time_stamp": 1.0, "identity": "user",
                             "status": "ipu_sl", "feature": "a", "ipu_id": 1})
        assert s.get_next_feature()["feature"] == "a"
        assert s.get_next_feature()["feature"] == "b"


class TestQueues:
    def test_pcm_queue(self):
        q = PCMQueue()
        q.push(np.arange(5, dtype=np.float32))
        q.push(np.arange(5, 8, dtype=np.float32))
        assert q.pull(10) is None
        out = q.pull(6)
        np.testing.assert_array_equal(out, np.arange(6, dtype=np.float32))
        assert q.available() == 2

    def test_pcm_queue_s16le(self):
        q = PCMQueue()
        q.push_s16le(np.array([16384, -16384], dtype="<i2").tobytes())
        out = q.pull(2)
        np.testing.assert_allclose(out, [0.5, -0.5])

    def test_thread_safe_queue(self):
        q = ThreadSafeQueue()
        q.put(1)
        q.put(2)
        assert q.drain() == [1, 2]
        assert q.get() is None


class TestIPUHandle:
    def test_lifecycle(self):
        h = IPUHandle("user", 1.0)
        assert not h.closed
        h.add_chunk(np.zeros(4), 1.1)
        h.set_end_timestamp(2.0)
        h.register_response_state({"decision": "dialog_ss", "state_1": 0.9})
        assert h.closed and h.duration() == 1.0
        assert h.response_states[0]["decision"] == "dialog_ss"


@pytest.mark.slow
class TestDuplexSession:
    def test_end_to_end_session(self):
        cfg = tiny_system()
        pipeline = DuplexPipeline(cfg, seed=0)
        sink = EventSink()
        handles = []
        sess = DuplexSession(pipeline, cfg, sink=sink,
                             user_ipu_outlets=[handles.append])

        n = cfg.duplex.gating.samples_per_chunk
        rng = np.random.RandomState(0)
        quiet = (0.0005 * rng.randn(3 * n)).astype(np.float32)
        from freeze_omni_tpu.training.vad import synth_speech
        loud = 0.5 * synth_speech(np.random.RandomState(7), 3 * n)

        # noise floor then speech then silence
        sess.enqueue_audio_data("user", {"audio": quiet, "enc": "f32"})
        sess.pump()
        sess.enqueue_audio_data("user", {"audio": loud, "enc": "f32"})
        sess.enqueue_audio_data("user", {"audio": quiet * 0, "enc": "f32"})
        while sess.pump():
            pass

        vad_events = sink.events_of("vad_event")
        statuses = [e["status"] for e in vad_events]
        assert "ipu_sl" in statuses and "ipu_el" in statuses
        assert len(handles) == 1 and handles[0].identity == "user"
        assert handles[0].closed

        updates = sink.events_of("dialog_state_update")
        assert len(updates) >= 1
        assert all(0.0 <= u["probs"]["state_1"] <= 1.0 for u in updates)
        assert len(handles[0].response_states) >= 1

        # shared KV grew beyond the system-role prefill
        assert int(np.asarray(sess.past_key_values.length)[0]) > \
            int(np.asarray(sess.system_role_kv.length)[0])

        # reset restores the role-prompt KV binding
        sess.reset_context()
        assert sess.past_key_values is sess.system_role_kv

    def test_48k_client_audio_resampled_at_ingest(self):
        """A 48 kHz client stream (s16le bytes) rides a per-identity
        streaming resampler to the VAD rate: the IPU lifecycle fires exactly
        as for native-16k audio (the reference rejects non-16k input,
        dialog_state_pred.py:348-400)."""
        from freeze_omni_tpu.frontend.wav import resample

        cfg = tiny_system()
        pipeline = DuplexPipeline(cfg, seed=0)
        sink = EventSink()
        sess = DuplexSession(pipeline, cfg, sink=sink)

        n = cfg.duplex.gating.samples_per_chunk
        rng = np.random.RandomState(0)
        quiet = (0.0005 * rng.randn(3 * n)).astype(np.float32)
        from freeze_omni_tpu.training.vad import synth_speech
        loud = 0.5 * synth_speech(np.random.RandomState(7), 3 * n)

        def to_48k_bytes(x):
            y = resample(x, 16000, 48000)
            return (np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()

        sess.enqueue_audio_data(
            "user", {"audio": to_48k_bytes(quiet), "sr": 48000,
                     "enc": "s16le"})
        sess.pump()
        sess.enqueue_audio_data(
            "user", {"audio": to_48k_bytes(loud), "sr": 48000,
                     "enc": "s16le"})
        sess.enqueue_audio_data(
            "user", {"audio": to_48k_bytes(quiet * 0), "sr": 48000,
                     "enc": "s16le"})
        while sess.pump():
            pass
        statuses = [e["status"] for e in sink.events_of("vad_event")]
        assert "ipu_sl" in statuses and "ipu_el" in statuses

    def test_responder_closes_the_loop(self):
        """With a responder attached and threshold 0, a user chunk triggers
        text + synthesized speech that re-enters as system audio."""
        import dataclasses

        import jax

        from freeze_omni_tpu.duplex.responder import DuplexResponder
        from freeze_omni_tpu.models import codec as codec_mod
        from freeze_omni_tpu.models import speech_decoder as sd
        from freeze_omni_tpu.tts import StreamingTTS

        cfg = tiny_system()
        cfg = dataclasses.replace(
            cfg, duplex=dataclasses.replace(cfg.duplex, resp_threshold=0.0),
            tts=dataclasses.replace(cfg.tts, max_tokens=24))
        pipeline = DuplexPipeline(cfg, seed=0)
        k1, k2 = jax.random.split(jax.random.PRNGKey(9))
        tts = StreamingTTS({"decoder": sd.init_params(k1, cfg.tts.decoder),
                            "codec": codec_mod.init_params(k2, cfg.tts.codec)},
                           cfg.tts)
        responder = DuplexResponder(pipeline.core, tts, cfg, max_tokens=12,
                                    segment=8)
        sink = EventSink()
        sess = DuplexSession(pipeline, cfg, sink=sink, responder=responder)

        n = cfg.duplex.gating.samples_per_chunk
        quiet = (0.0005 * np.random.RandomState(0).randn(n)).astype(np.float32)
        from freeze_omni_tpu.training.vad import synth_speech
        speech = 0.5 * synth_speech(np.random.RandomState(7), 2 * n)
        sess.enqueue_audio_data("user", {"audio": quiet, "enc": "f32"})
        sess.pump()
        sess.enqueue_audio_data("user", {"audio": speech, "enc": "f32"})
        while sess.pump():
            pass

        texts = sink.events_of("response_text")
        assert len(texts) >= 1 and isinstance(texts[0]["text"], str)
        audio = sink.events_of("response_audio")
        assert len(audio) >= 1 and audio[0]["pcm"].size > 0
        # synthesized audio went through the system identity (vad saw it)
        sys_events = [e for e in sink.events_of("vad_event")
                      if e["identity"] == "system"]
        assert len(sys_events) >= 1

    def test_warmup_and_release(self):
        cfg = tiny_system()
        pipeline = DuplexPipeline(cfg, seed=0)
        sess = DuplexSession(pipeline, cfg)
        sess.warmup()
        assert sess.past_key_values is sess.system_role_kv
        sess.start()
        sess.enqueue_audio_data("user", {
            "audio": np.zeros(cfg.duplex.gating.samples_per_chunk, np.float32),
            "enc": "f32"})
        import time

        time.sleep(0.3)
        sess.release()


class TestPCMQueueBackpressure:
    def test_bounded_queue_drops_oldest(self):
        q = PCMQueue(max_samples=10)
        q.push(np.arange(8, dtype=np.float32))
        q.push(np.arange(8, dtype=np.float32) + 100)
        assert q.available() == 10
        assert q.dropped == 6
        out = q.pull(10)
        # oldest 6 samples evicted: the survivors are [6,7] + the new 8
        np.testing.assert_array_equal(out[:2], [6.0, 7.0])
        np.testing.assert_array_equal(out[2:], np.arange(8) + 100.0)

    def test_default_cap_is_two_minutes(self):
        q = PCMQueue()
        assert q.max_samples == 120 * 16000
