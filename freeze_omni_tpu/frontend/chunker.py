"""Streaming fbank chunkers.

Two variants, matching the two reference paths:

- `OfflineChunker`: 160 ms audio chunks -> [1, 19, 80] fbank windows with a
  3-frame feature overlap and a 240-sample waveform overlap
  (bin/inference.py:43-80 `audioEncoderProcessor`).
- `GatingChunker`: 224 ms duplex chunks -> [1, 32, 80] (28 steps + 4 context)
  with a history ring for IPU-onset replay (models/AudioFeatureGating.py).

State lives in plain numpy (host staging buffers). The fbank transform
dispatches to the native C++ chunker (native/frontend/fbank.cc) when built —
zero device involvement on the per-chunk host path, which matters at scale:
the jitted-JAX fallback pays one tiny device dispatch (and a result sync) per
chunk per identity per session.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import ChunkerConfig, FbankConfig, GatingConfig
from .fbank import fbank


def _try_native_chunker(sample_rate, num_bins, frame_ms, shift_ms,
                        steps_per_chunk, context_steps, scale):
    try:
        from .native import NativeChunker, available
        if available():
            return NativeChunker(int(sample_rate), int(num_bins),
                                 float(frame_ms), float(shift_ms),
                                 int(steps_per_chunk), int(context_steps),
                                 float(scale))
    except Exception:
        pass
    return None


class OfflineChunker:
    """16-frame chunker with 3-frame context (offline wav->wav path)."""

    def __init__(self, cfg: ChunkerConfig = ChunkerConfig()):
        self.cfg = cfg
        self.fbank_cfg = FbankConfig(num_mel_bins=cfg.feat_dim)
        self.frame_overlap = cfg.frame_size - cfg.frame_shift
        self._native = _try_native_chunker(
            self.fbank_cfg.sample_rate, cfg.feat_dim,
            self.fbank_cfg.frame_length_ms, self.fbank_cfg.frame_shift_ms,
            cfg.chunk_size, cfg.chunk_overlap, 32768.0)
        self.reset()

    def get_chunk_size(self) -> int:
        return self.cfg.samples_per_chunk

    def reset(self) -> None:
        c = self.cfg
        self.input_sample = np.zeros(c.samples_per_chunk + self.frame_overlap, np.float32)
        self.input_chunk = np.zeros((1, c.frames_per_step, c.feat_dim), np.float32)
        if self._native is not None:
            self._native.reset()

    def process(self, audio: np.ndarray) -> np.ndarray:
        """audio: [samples_per_chunk] float in [-1, 1]. Returns [1, 19, 80]."""
        c = self.cfg
        if self._native is not None:
            return self._native.process(np.asarray(audio, np.float32)
                                        .reshape(-1)).copy()
        sample_data = np.asarray(audio, np.float32).reshape(-1) * 32768.0
        self.input_sample[: self.frame_overlap] = self.input_sample[-self.frame_overlap :]
        self.input_sample[self.frame_overlap :] = sample_data
        xs = np.asarray(fbank(self.input_sample, self.fbank_cfg))  # [16, 80]
        self.input_chunk[:, : c.chunk_overlap] = self.input_chunk[:, -c.chunk_overlap :]
        self.input_chunk[:, c.chunk_overlap :] = xs
        return self.input_chunk.copy()


class GatingChunker:
    """Duplex stateful fbank + VAD gating (per identity).

    `process_and_gate` contract matches AudioFeatureGating.process_and_gate:
    features are always extracted (state stays warm); chunks outside an IPU
    update the history ring and return None; `ipu_sl` chunks attach the onset
    history replay."""

    def __init__(self, cfg: GatingConfig = GatingConfig()):
        self.cfg = cfg
        self.fbank_cfg = cfg.fbank()
        self.frame_overlap = self.fbank_cfg.frame_length - self.fbank_cfg.frame_shift
        self._native = _try_native_chunker(
            cfg.sample_rate, cfg.feat_dim, cfg.frame_length_s * 1000.0,
            cfg.frame_shift_s * 1000.0, cfg.steps_per_chunk, cfg.context_steps,
            32767.0)
        self.reset()

    def reset(self) -> None:
        c = self.cfg
        self.input_sample = np.zeros(c.samples_per_chunk + self.frame_overlap, np.float32)
        self.input_chunk = np.zeros((1, c.frames_per_step, c.feat_dim), np.float32)
        self.history = np.zeros((c.history_size, c.frames_per_step, c.feat_dim), np.float32)
        if self._native is not None:
            self._native.reset()

    def extract(self, audio: np.ndarray) -> np.ndarray:
        c = self.cfg
        if self._native is not None:
            return self._native.process(np.asarray(audio, np.float32)
                                        .reshape(-1)).copy()
        sample_data = np.asarray(audio, np.float32).reshape(-1) * 32767.0
        self.input_sample[: self.frame_overlap] = self.input_sample[-self.frame_overlap :]
        self.input_sample[self.frame_overlap :] = sample_data
        xs = np.asarray(fbank(self.input_sample, self.fbank_cfg))  # [28, 80]
        self.input_chunk[:, : c.context_steps] = self.input_chunk[:, -c.context_steps :]
        self.input_chunk[:, c.context_steps :] = xs
        return self.input_chunk.copy()

    def process_and_gate(self, annotated_audio: dict) -> Optional[dict]:
        status = annotated_audio["status"]
        feature = self.extract(annotated_audio["audio"])

        if status is None:
            self.history[:-1] = self.history[1:]
            self.history[-1] = feature[0]
            return None

        out = {"feature": feature, "status": status, "feature_last_chunk": []}
        if status == "ipu_sl" and self.cfg.onset_cache_size > 0:
            out["feature_last_chunk"] = [
                self.history[i][None] for i in range(-self.cfg.onset_cache_size, 0)
            ]
        return out
