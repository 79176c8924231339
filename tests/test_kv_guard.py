import dataclasses

import numpy as np

from freeze_omni_tpu.config import tiny_system
from freeze_omni_tpu.runtime.engine import ServingEngine


class TestKvCapacityGuard:
    def test_engine_rolls_session_near_capacity(self):
        """Sliding-window KV (VERDICT r1 #4): nearing capacity triggers a
        ROLL that pins the role prefix and keeps the recent window — never a
        reset to the bare role prefill, and predictions keep flowing."""
        cfg = tiny_system()  # max_kv_len 256; margin 128 -> roll above 128
        engine = ServingEngine(cfg, seed=0)
        engine.open_session("s1", role="Guard test.")
        slot = engine.store.slot_of("s1")
        role_len = engine.store.kv_length(slot)
        cap_ = cfg.audio_llm.llm.max_kv_len
        target = (cap_ - cfg.serving.kv_margin) // 2
        keep = min(cfg.serving.kv_keep_recent, max(target - role_len, 16))

        chunk = np.random.RandomState(0).randn(1, 32, 80).astype(np.float32)
        lengths = [role_len]
        n_preds = 0
        for i in range(50):  # each chunk adds >=4 tokens; crosses the margin
            engine.submit_chunk("s1", "user", chunk, is_sl=(i == 0))
            out = engine.tick()
            n_preds += len(out.get("user", {}))
            lengths.append(engine.store.kv_length(slot))
        cap = cfg.audio_llm.llm.max_kv_len
        assert max(lengths) <= cap
        drops = [(a, b) for a, b in zip(lengths, lengths[1:]) if a > b]
        assert drops, lengths
        # every drop lands at prefix + window (+ the tick's new tokens), far
        # above the bare role prefill — context survives the roll
        for before, after in drops:
            assert after >= role_len + keep, (before, after, role_len, keep)
        assert n_preds == 50  # predictions uninterrupted across rolls

    def test_session_store_tracks_prefix_len(self):
        cfg = tiny_system()
        engine = ServingEngine(cfg, seed=0)
        engine.open_session("a", role="Short role.")
        slot = engine.store.slot_of("a")
        assert engine.store.prefix_len[slot] == engine.store.kv_length(slot)
        engine.close_session("a")
        engine.open_session("b", role="A different and longer role prompt.")
        slot_b = engine.store.slot_of("b")
        assert engine.store.prefix_len[slot_b] == engine.store.kv_length(slot_b)


class TestDuplexSessionRoll:
    def test_long_session_rolls_without_context_reset(self):
        """VERDICT r1 done-criterion: a long synthetic session crosses KV
        capacity without any context-reset error event — the KV rolls."""
        import numpy as np

        from freeze_omni_tpu.duplex.engine import DuplexPipeline, DuplexSession
        from freeze_omni_tpu.duplex.events import EventSink

        cfg = tiny_system()
        pipeline = DuplexPipeline(cfg, seed=0)
        sink = EventSink()
        sess = DuplexSession(pipeline, cfg, sink=sink)

        n = cfg.duplex.gating.samples_per_chunk
        rng = np.random.RandomState(0)
        quiet = (0.0005 * rng.randn(3 * n)).astype(np.float32)
        from freeze_omni_tpu.training.vad import synth_speech
        loud = 0.5 * synth_speech(np.random.RandomState(7), 3 * n)
        sess.enqueue_audio_data("user", {"audio": quiet, "enc": "f32"})
        sess.pump()
        # long alternating speech bursts: enough prefills to cross capacity
        for _ in range(14):
            sess.enqueue_audio_data("user", {"audio": loud, "enc": "f32"})
            sess.enqueue_audio_data("user", {"audio": quiet * 0, "enc": "f32"})
            while sess.pump():
                pass

        cap = cfg.audio_llm.llm.max_kv_len
        assert int(np.asarray(sess.past_key_values.length)[0]) <= cap
        kinds = [e for e, _ in sink.history]
        assert "kv_roll" in kinds, sorted(set(kinds))
        resets = [p for e, p in sink.history
                  if e == "error" and p.get("where") == "context"]
        assert not resets
        # state predictions kept flowing after the first roll
        first_roll = kinds.index("kv_roll")
        assert "dialog_state_update" in kinds[first_roll + 1:]
