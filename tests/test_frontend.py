import math

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


def torch_kaldi_fbank(wave: np.ndarray, cfg: FbankConfig) -> np.ndarray:
    """Independent Kaldi-fbank oracle in torch (VERDICT r2 #8), written
    directly from the torchaudio.compliance.kaldi.fbank algorithm (the
    function the reference calls, bin/inference.py:77-78,
    models/AudioFeatureGating.py:65-69) — torchaudio itself is absent from
    this image. Structured differently from frontend.fbank.fbank_ref
    (tensor unfold framing, mel bank built from per-bin mel slopes) so the
    two do not share derivation mistakes.

    Kaldi semantics: snip-edges strided framing, DC removal, preemphasis
    with replicated first sample, povey window (hann^0.85), zero-pad to the
    next power of two, power spectrum over the first n_fft//2 bins
    (nyquist excluded from the mel banks), triangular filters in mel space
    (mel = 1127 ln(1 + f/700)), log with the float32-epsilon floor."""
    import torch

    x = torch.tensor(np.asarray(wave, np.float32))
    fl, fs = cfg.frame_length, cfg.frame_shift
    frames = x.unfold(0, fl, fs)  # [m, fl] snip-edges
    if cfg.remove_dc_offset:
        frames = frames - frames.mean(dim=1, keepdim=True)
    if cfg.preemphasis:
        shifted = torch.cat([frames[:, :1], frames[:, :-1]], dim=1)
        frames = frames - cfg.preemphasis * shifted
    i = torch.arange(fl, dtype=torch.float64)
    window = (0.5 - 0.5 * torch.cos(2 * math.pi * i / (fl - 1))) ** 0.85
    frames = frames * window.float()

    n_fft = cfg.padded_window_size
    spec = torch.fft.rfft(frames, n=n_fft).abs()
    if cfg.use_power:
        spec = spec ** 2

    # mel banks over fft bins 0..n_fft//2-1 (Kaldi's get_mel_banks)
    nyq = cfg.sample_rate / 2.0
    high = nyq + cfg.high_freq if cfg.high_freq <= 0 else cfg.high_freq
    mel = lambda f: 1127.0 * math.log(1.0 + f / 700.0)
    ml, mh = mel(cfg.low_freq), mel(high)
    n_bins = cfg.num_mel_bins
    delta = (mh - ml) / (n_bins + 1)
    fft_freqs = torch.arange(n_fft // 2, dtype=torch.float64) \
        * cfg.sample_rate / n_fft
    bin_mels = 1127.0 * torch.log1p(fft_freqs / 700.0)  # [F]
    banks = torch.zeros(n_bins, n_fft // 2, dtype=torch.float64)
    for b in range(n_bins):
        left, center, right = (ml + b * delta, ml + (b + 1) * delta,
                               ml + (b + 2) * delta)
        up = (bin_mels - left) / (center - left)
        down = (right - bin_mels) / (right - center)
        banks[b] = torch.clamp(torch.minimum(up, down), min=0.0)
    feats = spec.double() @ torch.cat(
        [banks, torch.zeros(n_bins, spec.shape[1] - n_fft // 2).double()],
        dim=1).T
    eps = float(np.finfo(np.float32).eps)
    return torch.log(torch.clamp(feats, min=eps)).float().numpy()


class TestTorchOracleParity:
    """All three fbank implementations (numpy golden, JAX, native C) against
    the independently-written torch oracle — breaks the shared-ancestry risk
    of self-referential goldens (VERDICT r2 weak #6)."""

    @pytest.mark.parametrize("cfg", [
        FbankConfig(),                      # 25 ms / 10 ms offline variant
        GatingConfig().fbank(),             # 16 ms / 8 ms duplex variant
    ])
    def test_numpy_and_jax_match_torch_oracle(self, cfg):
        rng = np.random.RandomState(11)
        wav = (rng.randn(4000) * 2000).astype(np.float32) \
            + 8000.0 * np.sin(2 * np.pi * 523.0 * np.arange(4000) / 16000
                              ).astype(np.float32)
        oracle = torch_kaldi_fbank(wav, cfg)
        ref = fb.fbank_ref(wav, cfg)
        out = np.asarray(fb.fbank(wav, cfg))
        assert oracle.shape == ref.shape
        np.testing.assert_allclose(ref, oracle, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=3e-3)

    def test_native_matches_torch_oracle(self):
        from freeze_omni_tpu.frontend import native

        if not native.available():
            pytest.skip("native frontend not built")
        cfg = FbankConfig()
        rng = np.random.RandomState(12)
        wav = (rng.randn(4000) * 3000).astype(np.float32)
        oracle = torch_kaldi_fbank(wav, cfg)
        nf = native.NativeFbank(sample_rate=cfg.sample_rate, num_bins=80,
                                frame_ms=cfg.frame_length_ms,
                                shift_ms=cfg.frame_shift_ms)
        got = nf(wav)
        np.testing.assert_allclose(got, oracle, rtol=3e-4, atol=3e-3)


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
