import numpy as np
import pytest

from freeze_omni_tpu.config import FbankConfig, GatingConfig
from freeze_omni_tpu.frontend import native
from freeze_omni_tpu.frontend.chunker import GatingChunker, OfflineChunker
from freeze_omni_tpu.frontend import wav
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
        pc._native = None  # force the jitted-JAX path as the oracle
        for _ in range(4):
            a = (rng.randn(2560) * 0.05).astype(np.float32)
            np.testing.assert_allclose(nc.process(a), pc.process(a),
                                       rtol=1e-4, atol=1e-3)

    def test_duplex_parity_with_python_gating(self):
        rng = np.random.RandomState(3)
        nc = native.NativeChunker(frame_ms=16, shift_ms=8, steps_per_chunk=28,
                                  context_steps=4, scale=32767)
        pc = GatingChunker()
        pc._native = None  # force the jitted-JAX path as the oracle
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


class TestNativeResampler:
    """native/frontend/resample.cc vs frontend/wav.py::resample (same filter
    design as the reference's torchaudio Resample, bin/inference.py:110)."""

    RATES = [(48000, 16000), (44100, 16000), (22050, 16000), (8000, 16000),
             (16000, 24000), (24000, 16000)]

    def test_one_shot_matches_python(self):
        rng = np.random.RandomState(3)
        for orig, new in self.RATES:
            x = (rng.randn(orig // 2 + 37) * 0.3).astype(np.float32)
            ref = wav.resample(x, orig, new)
            got = native.NativeResampler(orig, new)(x)
            assert got.shape == ref.shape, (orig, new)
            np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_streaming_concatenates_to_one_shot(self):
        """push* + flush over irregular chunk sizes emits exactly the
        one-shot output (incl. down > kernel-length rates like 44.1k->16k)."""
        rng = np.random.RandomState(4)
        for orig, new in self.RATES:
            x = (rng.randn(orig // 2 + 11) * 0.3).astype(np.float32)
            ref = wav.resample(x, orig, new)
            rs = native.NativeResampler(orig, new)
            parts, i = [], 0
            for sz in [160, 333, 1024, 7, 2560] * 200:
                if i >= len(x):
                    break
                parts.append(rs.push(x[i:i + sz]))
                i += sz
            parts.append(rs.flush())
            got = np.concatenate(parts)
            assert got.shape == ref.shape, (orig, new)
            np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_reset_reuses_state(self):
        rs = native.NativeResampler(48000, 16000)
        x = np.sin(np.arange(4800, dtype=np.float32) * 0.01)
        a = rs(x)
        rs.reset()
        b = np.concatenate([rs.push(x), rs.flush()])
        np.testing.assert_allclose(a, b)


class TestNativeVAD:
    """native/frontend/vad.cc vs the numpy twin (duplex/vad.LearnedVAD
    _prob_py). Probabilities agree to ~1e-3 (the native fbank's log-floor
    rounding differs slightly from fbank_ref) and the IPU status sequences —
    what the duplex engine actually consumes — are identical."""

    def _pair(self):
        from freeze_omni_tpu.duplex.vad import LearnedVAD

        nat, py = LearnedVAD(), LearnedVAD()
        assert nat._native is not None, "native VAD did not build"
        py._native = None
        nat.reset()
        py.reset()
        return nat, py

    def _corpus(self):
        from freeze_omni_tpu.training.vad import synth_speech

        rng = np.random.RandomState(0)
        segs = []
        for i in range(6):
            segs += [0.02 * rng.randn(512).astype(np.float32)
                     for _ in range(12)]
            utt = np.asarray(0.5 * synth_speech(np.random.RandomState(100 + i),
                                                24 * 512), np.float32)
            segs += [utt[j * 512:(j + 1) * 512] for j in range(24)]
            segs += [np.zeros(512, np.float32)] * 30
        return segs

    def test_prob_parity_and_no_drift(self):
        nat, py = self._pair()
        errs = [abs(nat._prob(s) - py._prob_py(s)) for s in self._corpus()]
        errs = np.asarray(errs)
        assert errs.max() < 2e-3, errs.max()
        # bounded, not drifting: the late half is no worse than the early half
        half = len(errs) // 2
        assert errs[half:].max() < 2e-3

    def test_sub_frame_pushes_buffer_identically(self):
        nat, py = self._pair()
        rng = np.random.RandomState(3)
        for n in (100, 27, 1, 200, 512, 5):
            a = (0.1 * rng.randn(n)).astype(np.float32)
            pn, pp = nat._prob(a), py._prob_py(a)
            assert abs(pn - pp) < 2e-3, (n, pn, pp)

    def test_ipu_status_sequence_identical(self):
        nat, py = self._pair()
        statuses = []
        for s in self._corpus():
            a = nat.predict({"audio": s, "time_stamp": None})
            b = py.predict({"audio": s, "time_stamp": None})
            statuses.append((a["status"], b["status"]))
        assert all(x == y for x, y in statuses)
        seen = {x for x, _ in statuses}
        assert "ipu_sl" in seen and "ipu_el" in seen, seen


def test_chunkers_default_to_native():
    """Serving constructs chunkers via the frontends; when the library is
    built they must take the zero-device-dispatch path by default."""
    assert OfflineChunker()._native is not None
    assert GatingChunker()._native is not None
