import numpy as np
import pytest

from freeze_omni_tpu.config import FbankConfig, GatingConfig
from freeze_omni_tpu.frontend import native
from freeze_omni_tpu.frontend.chunker import GatingChunker, OfflineChunker
from freeze_omni_tpu.frontend.fbank import fbank_ref

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native frontend not built")


class TestNativeFbank:
    def test_matches_golden_25_10(self):
        rng = np.random.RandomState(0)
        wav = (rng.randn(4000) * 1500).astype(np.float32)
        out = native.NativeFbank()(wav)
        ref = fbank_ref(wav, FbankConfig())
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)

    def test_matches_golden_16_8(self):
        cfg = GatingConfig().fbank()
        rng = np.random.RandomState(1)
        wav = (rng.randn(3712) * 900).astype(np.float32)
        out = native.NativeFbank(frame_ms=16, shift_ms=8)(wav)
        ref = fbank_ref(wav, cfg)
        assert out.shape == (28, 80)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)

    def test_short_input(self):
        out = native.NativeFbank()(np.zeros(100, np.float32))
        assert out.shape == (0, 80)


class TestNativeChunker:
    def test_offline_parity_with_python_chunker(self):
        rng = np.random.RandomState(2)
        nc = native.NativeChunker()
        pc = OfflineChunker()
        for _ in range(4):
            a = (rng.randn(2560) * 0.05).astype(np.float32)
            np.testing.assert_allclose(nc.process(a), pc.process(a),
                                       rtol=1e-4, atol=1e-3)

    def test_duplex_parity_with_python_gating(self):
        rng = np.random.RandomState(3)
        nc = native.NativeChunker(frame_ms=16, shift_ms=8, steps_per_chunk=28,
                                  context_steps=4, scale=32767)
        pc = GatingChunker()
        assert nc.chunk_samples == pc.cfg.samples_per_chunk == 3584
        for _ in range(3):
            a = (rng.randn(3584) * 0.05).astype(np.float32)
            np.testing.assert_allclose(nc.process(a), pc.extract(a),
                                       rtol=1e-4, atol=1e-3)

    def test_reset(self):
        nc = native.NativeChunker()
        a = np.ones(2560, np.float32) * 0.1
        o1 = nc.process(a)
        nc.reset()
        o2 = nc.process(a)
        np.testing.assert_allclose(o1, o2)

    def test_wrong_size_raises(self):
        nc = native.NativeChunker()
        with pytest.raises(AssertionError, match="expected 2560"):
            nc.process(np.zeros(100, np.float32))
