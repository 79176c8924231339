import numpy as np
import pytest

from freeze_omni_tpu.config import tiny_system
from freeze_omni_tpu.runtime.service import DuplexService


def _speech(n, seed=0):
    # a real speech surrogate (harmonic stack + formants + syllabic AM):
    # the learned VAD rejects pure tones as music/hum, as it should
    from freeze_omni_tpu.training.vad import synth_speech

    return synth_speech(np.random.RandomState(seed), n) * 0.5


class TestDuplexService:
    def test_two_sessions_share_batched_ticks(self):
        cfg = tiny_system()
        svc = DuplexService(cfg, seed=0)
        sinks = {sid: svc.open_session(sid) for sid in ("a", "b")}

        n = cfg.duplex.gating.samples_per_chunk
        quiet = np.zeros(n, np.float32)
        for sid in ("a", "b"):
            svc.enqueue_audio_data(sid, "user", {"audio": quiet})
        svc.step()
        for sid in ("a", "b"):
            svc.enqueue_audio_data(sid, "user", {"audio": _speech(2 * n)})
            svc.enqueue_audio_data(sid, "user", {"audio": np.zeros(3 * n,
                                                                   np.float32)})
        for _ in range(12):
            if not svc.step():
                break

        for sid in ("a", "b"):
            ev = sinks[sid]
            statuses = [e["status"] for e in ev.events_of("vad_event")]
            assert "ipu_sl" in statuses and "ipu_el" in statuses, (sid, statuses)
            updates = ev.events_of("dialog_state_update")
            assert len(updates) >= 2, sid
            assert all(0 <= u["probs"]["state_1"] <= 1 for u in updates)

        # per-session KV advanced independently in the shared store
        la = svc.engine.store.kv_length(svc.engine.store.slot_of("a"))
        lb = svc.engine.store.kv_length(svc.engine.store.slot_of("b"))
        assert la > 0 and lb > 0

        svc.close_session("a")
        assert svc.engine.num_active == 1

    def test_pipelined_service_matches_sync_predictions(self):
        """cfg.serving.pipeline_ticks: decisions run one tick late but the
        prediction VALUES must match the sync service exactly (same audio,
        same params)."""
        import dataclasses as _dc

        def drive(pipelined: bool):
            cfg = tiny_system()
            cfg = _dc.replace(cfg, serving=_dc.replace(
                cfg.serving, pipeline_ticks=pipelined))
            svc = DuplexService(cfg, seed=0)
            sink = svc.open_session("a")
            n = cfg.duplex.gating.samples_per_chunk
            svc.enqueue_audio_data("a", "user",
                                   {"audio": np.zeros(n, np.float32)})
            svc.step()
            svc.enqueue_audio_data("a", "user", {"audio": _speech(2 * n)})
            svc.enqueue_audio_data("a", "user",
                                   {"audio": np.zeros(3 * n, np.float32)})
            for _ in range(14):
                if not svc.step():
                    break
            svc.drain_ticks()
            return [round(u["probs"]["state_1"], 5)
                    for u in sink.events_of("dialog_state_update")]

        sync = drive(False)
        pip = drive(True)
        assert sync and sync == pip

    @pytest.mark.slow
    def test_service_fast_response_closes_loop(self):
        """With tts_params attached and threshold 0, a user chunk triggers the
        one-dispatch fast response whose audio re-enters as system input."""
        import dataclasses

        import jax

        from freeze_omni_tpu.models import codec as codec_mod
        from freeze_omni_tpu.models import speech_decoder as sd

        cfg = tiny_system()
        cfg = dataclasses.replace(
            cfg, duplex=dataclasses.replace(cfg.duplex, resp_threshold=0.0))
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        tts_params = {"decoder": sd.init_params(k1, cfg.tts.decoder),
                      "codec": codec_mod.init_params(k2, cfg.tts.codec)}
        svc = DuplexService(cfg, seed=0, tts_params=tts_params)
        sink = svc.open_session("s1")

        n = cfg.duplex.gating.samples_per_chunk
        svc.enqueue_audio_data("s1", "user", {"audio": np.zeros(n, np.float32)})
        svc.step()
        svc.enqueue_audio_data("s1", "user", {"audio": _speech(2 * n)})
        for _ in range(10):
            if not svc.step():
                break

        texts = sink.events_of("response_text")
        audio = sink.events_of("response_audio")
        assert texts and audio
        assert audio[0]["sr"] == cfg.tts.codec.sample_rate
        assert audio[0]["pcm"].size > 0
        sys_vad = [e for e in sink.events_of("vad_event")
                   if e["identity"] == "system"]
        assert sys_vad, "synthesized speech never re-entered as system audio"

    def test_response_continuation_emits_and_completes(self):
        """Multi-sentence continuation: a registered in-flight response
        advances by batched text segments across service steps, flushes its
        buffer at the token cap, and clears — without error events."""
        import dataclasses

        import jax

        from freeze_omni_tpu.models import codec as codec_mod
        from freeze_omni_tpu.models import speech_decoder as sd

        cfg = tiny_system()
        cfg = dataclasses.replace(
            cfg, duplex=dataclasses.replace(cfg.duplex, resp_threshold=2.0,
                                            resp_segment=6,
                                            resp_max_tokens=10))
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        tts_params = {"decoder": sd.init_params(k1, cfg.tts.decoder),
                      "codec": codec_mod.init_params(k2, cfg.tts.codec)}
        svc = DuplexService(cfg, seed=0, tts_params=tts_params)
        sink = svc.open_session("s1")
        n = cfg.duplex.gating.samples_per_chunk
        svc.enqueue_audio_data("s1", "user", {"audio": np.zeros(n, np.float32)})
        svc.step()

        slot = svc.engine.store.slot_of("s1")
        before = svc.engine.store.kv_length(slot)
        fe = svc.sessions["s1"]
        fe.resp = {"last": 3, "n": 0, "toks": [], "hids": []}
        for _ in range(4):
            if fe.resp is None:
                break
            assert svc._continue_responses()
        assert fe.resp is None  # hit eod or the 10-token cap and completed
        svc.flush_tts()  # sentence synthesis runs off the tick thread
        assert svc.engine.store.kv_length(slot) > before
        assert not sink.events_of("error")
        # continuation without any respondents is a no-op
        assert not svc._continue_responses()

    def test_user_barge_in_interrupts_response(self):
        """A user speech onset (ipu_sl) while a response continuation is in
        flight cancels it and emits response_interrupted."""
        cfg = tiny_system()
        svc = DuplexService(cfg, seed=0)
        sink = svc.open_session("s1")
        n = cfg.duplex.gating.samples_per_chunk
        svc.enqueue_audio_data("s1", "user", {"audio": np.zeros(n, np.float32)})
        svc.step()
        fe = svc.sessions["s1"]
        fe.resp = {"last": 3, "n": 0, "toks": [], "hids": []}
        svc.enqueue_audio_data("s1", "user", {"audio": _speech(2 * n)})
        for _ in range(6):
            if fe.resp is None:
                break
            svc.step()
        assert fe.resp is None
        assert sink.events_of("response_interrupted")

    def test_batched_service_matches_single_session_engine(self):
        """A session served through DuplexService must produce the same state
        probabilities as the same audio through a solo-session service (the
        batching must not change results)."""
        cfg = tiny_system()
        n = cfg.duplex.gating.samples_per_chunk
        audio = [np.zeros(n, np.float32), _speech(2 * n),
                 np.zeros(2 * n, np.float32)]

        def run(sids):
            svc = DuplexService(cfg, seed=0)
            sinks = {sid: svc.open_session(sid, role="Parity.") for sid in sids}
            for a in audio:
                for sid in sids:
                    svc.enqueue_audio_data(sid, "user", {"audio": a})
            for _ in range(16):
                if not svc.step():
                    break
            return {sid: [u["probs"]["state_1"]
                          for u in sinks[sid].events_of("dialog_state_update")]
                    for sid in sids}

        solo = run(["x"])["x"]
        duo = run(["x", "y"])
        assert len(solo) >= 2
        for sid in ("x", "y"):
            assert len(duo[sid]) == len(solo)
            np.testing.assert_allclose(duo[sid], solo, atol=1e-4)
