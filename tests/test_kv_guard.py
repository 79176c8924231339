import dataclasses

import numpy as np

from freeze_omni_tpu.config import tiny_system
from freeze_omni_tpu.runtime.engine import ServingEngine


class TestKvCapacityGuard:
    def test_engine_resets_session_near_capacity(self):
        cfg = tiny_system()  # max_kv_len 256; guard at cap-64
        engine = ServingEngine(cfg, seed=0)
        engine.open_session("s1", role="Guard test.")
        slot = engine.store.slot_of("s1")
        base = engine.store.kv_length(slot)

        chunk = np.random.RandomState(0).randn(1, 32, 80).astype(np.float32)
        lengths = [base]
        for i in range(50):  # each chunk adds >=4 tokens; crosses cap-64=192
            engine.submit_chunk("s1", "user", chunk, is_sl=(i == 0))
            engine.tick()
            lengths.append(engine.store.kv_length(slot))
        cap = cfg.audio_llm.llm.max_kv_len
        assert max(lengths) <= cap
        # a reset must have occurred (length dropped back toward the role len)
        drops = [a - b for a, b in zip(lengths, lengths[1:]) if a > b]
        assert drops, lengths
