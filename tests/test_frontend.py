import numpy as np
import pytest

from freeze_omni_tpu.config import ChunkerConfig, FbankConfig, GatingConfig
from freeze_omni_tpu.frontend import fbank as fb
from freeze_omni_tpu.frontend.chunker import GatingChunker, OfflineChunker
from freeze_omni_tpu.frontend.cmvn import apply_cmvn, load_json_cmvn
from freeze_omni_tpu.frontend.wav import read_wav, resample, write_wav


def _tone(n, sr=16000, f=440.0, amp=0.3):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


class TestFbank:
    def test_jax_matches_numpy_golden_25_10(self):
        wav = (np.random.RandomState(7).randn(4000) * 2000).astype(np.float32)
        cfg = FbankConfig()
        ref = fb.fbank_ref(wav, cfg)
        out = np.asarray(fb.fbank(wav, cfg))
        assert ref.shape == (1 + (4000 - 400) // 160, 80)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-3)

    def test_jax_matches_golden_tone_energy_weighted(self):
        # pure tone: leakage-floor bins are roundoff-dominated in float32; compare
        # in the linear domain relative to the frame's peak energy.
        wav = _tone(4000) * 32768.0
        cfg = FbankConfig()
        ref = np.exp(fb.fbank_ref(wav, cfg))
        out = np.exp(np.asarray(fb.fbank(wav, cfg)))
        peak = ref.max(axis=1, keepdims=True)
        assert np.max(np.abs(out - ref) / peak) < 1e-4

    def test_jax_matches_numpy_golden_16_8(self):
        cfg = GatingConfig().fbank()
        wav = (np.random.RandomState(0).randn(3712) * 1000).astype(np.float32)
        ref = fb.fbank_ref(wav, cfg)
        out = np.asarray(fb.fbank(wav, cfg))
        assert ref.shape == (28, 80)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-3)

    def test_batched(self):
        cfg = FbankConfig()
        rng = np.random.RandomState(3)
        wav = (rng.randn(2, 2000) * 1500).astype(np.float32)
        out = np.asarray(fb.fbank(wav, cfg))
        assert out.shape == (2, 1 + (2000 - 400) // 160, 80)
        np.testing.assert_allclose(out[1], fb.fbank_ref(wav[1], cfg), rtol=2e-4, atol=2e-3)

    def test_mel_banks_shape_and_nyquist_zero(self):
        cfg = FbankConfig()
        banks = fb.mel_banks(cfg)
        assert banks.shape == (80, 257)
        assert np.all(banks[:, -1] == 0.0)
        # every filter has some support
        assert np.all(banks.sum(axis=1) > 0)


class TestChunkers:
    def test_offline_chunker_shapes_and_overlap(self):
        ch = OfflineChunker()
        assert ch.get_chunk_size() == 2560
        a = _tone(2560)
        out1 = ch.process(a)
        assert out1.shape == (1, 19, 80)
        out2 = ch.process(a)
        # 3-frame context of chunk 2 == last 3 frames of chunk 1
        np.testing.assert_allclose(out2[0, :3], out1[0, -3:])

    def test_offline_chunker_continuity(self):
        """Chunked fbank == full-utterance fbank once waveform overlap is active."""
        ch = OfflineChunker()
        rng = np.random.RandomState(1)
        wav = rng.randn(2560 * 3).astype(np.float32) * 0.1
        outs = [ch.process(wav[i * 2560 : (i + 1) * 2560]) for i in range(3)]
        # frames from the second chunk onward must match the full fbank
        full = fb.fbank_ref(
            np.concatenate([np.zeros(240, np.float32), wav * 32768.0])
        )
        # chunk i (i>=1) frames correspond to full frames [16i, 16i+16)
        got = outs[2][0, 3:]
        np.testing.assert_allclose(got, full[32:48], rtol=2e-4, atol=2e-3)

    def test_gating_chunker(self):
        g = GatingChunker()
        audio = _tone(3584)
        assert g.process_and_gate({"audio": audio, "status": None}) is None
        out = g.process_and_gate({"audio": audio, "status": "ipu_sl"})
        assert out is not None and np.asarray(out["feature"]).shape == (1, 32, 80)
        assert len(out["feature_last_chunk"]) == g.cfg.onset_cache_size


class TestCmvnWavResample:
    def test_cmvn_roundtrip(self, tmp_path):
        import json

        rng = np.random.RandomState(0)
        frames = rng.randn(1000, 8) * 3 + 5
        stats = {
            "mean_stat": frames.sum(0).tolist(),
            "var_stat": (frames**2).sum(0).tolist(),
            "frame_num": 1000,
        }
        p = tmp_path / "cmvn.json"
        p.write_text(json.dumps(stats))
        mean, istd = load_json_cmvn(str(p))
        normed = apply_cmvn(frames.astype(np.float32), mean, istd)
        assert abs(float(np.mean(normed))) < 1e-2
        assert abs(float(np.std(normed)) - 1.0) < 1e-2

    def test_wav_roundtrip(self, tmp_path):
        x = _tone(1600)
        p = str(tmp_path / "t.wav")
        write_wav(p, x, 16000)
        y, sr = read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(x, y, atol=1e-3)

    def test_resample_tone_preserved(self):
        x = _tone(16000, f=440.0)
        y = resample(x, 16000, 24000)
        assert abs(y.shape[0] - 24000) <= 2
        # the 440 Hz tone must survive with ~unchanged amplitude
        seg = y[2000:-2000]
        assert 0.28 < np.abs(seg).max() < 0.32
        # frequency check by zero crossings
        zc = np.sum(np.diff(np.sign(seg)) != 0)
        f_est = zc / 2 / (len(seg) / 24000)
        assert abs(f_est - 440) < 5
