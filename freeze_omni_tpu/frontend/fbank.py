"""Kaldi-compatible log-mel filterbank, TPU-native.

The reference computes fbank on the host through torchaudio's C++ Kaldi kernels
(bin/inference.py:77-78, models/AudioFeatureGating.py:65-69). Here the whole
transform is expressed as a static-shape JAX function (frame gather -> DC removal
-> pre-emphasis -> Povey window -> rFFT -> power -> mel matmul -> log) so it can
be jitted, batched and fused with the encoder on the TPU; `fbank_ref` is a
numpy implementation of the same Kaldi algorithm used as the golden in tests.

Both variants used by the reference are covered: 25ms/10ms (offline path) and
16ms/8ms (duplex path), dither=0, snip-edges semantics.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FbankConfig

# float32 machine epsilon: Kaldi's log floor
_EPS = float(np.finfo(np.float32).eps)


def _mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@lru_cache(maxsize=8)
def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """Triangular mel filterbank matrix, shape [num_mel_bins, n_fft//2 + 1].

    Matches Kaldi's get_mel_banks: filters defined over the first n_fft//2 FFT
    bins (the nyquist bin column is zero)."""
    n_fft = cfg.padded_window_size
    num_fft_bins = n_fft // 2
    fft_bin_width = cfg.sample_rate / n_fft

    high_freq = cfg.high_freq if cfg.high_freq > 0 else cfg.sample_rate / 2 + cfg.high_freq
    mel_low = _mel(cfg.low_freq)
    mel_high = _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)

    bin_idx = np.arange(cfg.num_mel_bins)[:, None]  # [M, 1]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins)[None, :]  # [1, F]
    mels = _mel(freqs)

    up = (mels - left_mel) / (center_mel - left_mel)
    down = (right_mel - mels) / (right_mel - center_mel)
    banks = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)

    out = np.zeros((cfg.num_mel_bins, num_fft_bins + 1), dtype=np.float32)
    out[:, :num_fft_bins] = banks
    return out


@lru_cache(maxsize=8)
def _window(cfg: FbankConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    t = np.arange(n, dtype=np.float64)
    if cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * t)) ** 0.85
    elif cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * t)
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * t)
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window_type {cfg.window_type}")
    return w.astype(np.float32)


def num_frames(cfg: FbankConfig, num_samples: int) -> int:
    if not cfg.snip_edges:
        raise NotImplementedError("only snip_edges=True is used by the reference")
    if num_samples < cfg.frame_length:
        return 0
    return 1 + (num_samples - cfg.frame_length) // cfg.frame_shift


# ---------------------------------------------------------------------------
# numpy golden reference
# ---------------------------------------------------------------------------


def fbank_ref(waveform: np.ndarray, cfg: FbankConfig = FbankConfig()) -> np.ndarray:
    """Golden-path Kaldi fbank in float64-ish numpy. waveform: [n] float
    (already scaled by 32768 as the reference does). Returns [m, num_mel_bins].
    """
    n = waveform.shape[-1]
    m = num_frames(cfg, n)
    fl, fs = cfg.frame_length, cfg.frame_shift
    frames = np.stack([waveform[i * fs : i * fs + fl] for i in range(m)]).astype(np.float32)

    if cfg.remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if cfg.preemphasis != 0.0:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - cfg.preemphasis * prev
    frames = frames * _window(cfg)[None, :]

    n_fft = cfg.padded_window_size
    padded = np.zeros((m, n_fft), dtype=np.float32)
    padded[:, :fl] = frames
    spec = np.abs(np.fft.rfft(padded, axis=1)).astype(np.float32)
    if cfg.use_power:
        spec = spec**2
    mel = spec @ mel_banks(cfg).T
    return np.log(np.maximum(mel, _EPS)).astype(np.float32)


# ---------------------------------------------------------------------------
# JAX (jit/batch friendly)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def fbank(waveform: jnp.ndarray, cfg: FbankConfig = FbankConfig()) -> jnp.ndarray:
    """Kaldi fbank; waveform [..., n] float32 (scaled by 32768). Returns
    [..., m, num_mel_bins]. Static shapes: m derives from n at trace time."""
    n = waveform.shape[-1]
    m = num_frames(cfg, n)
    fl, fs = cfg.frame_length, cfg.frame_shift

    idx = (np.arange(m)[:, None] * fs + np.arange(fl)[None, :])  # [m, fl] static
    frames = waveform[..., idx]  # [..., m, fl]

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemphasis * prev
    frames = frames * jnp.asarray(_window(cfg))

    n_fft = cfg.padded_window_size
    pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - fl)]
    padded = jnp.pad(frames, pad)
    spec = jnp.abs(jnp.fft.rfft(padded, axis=-1))
    if cfg.use_power:
        spec = spec * spec
    mel = jnp.einsum("...f,mf->...m", spec, jnp.asarray(mel_banks(cfg)),
                     preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, _EPS))
