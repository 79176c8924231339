"""Streaming VAD with the PureVAD contract.

The reference imports an absent `periphrals.PureVAD` (bin/dialog_state_pred.py:134)
whose contract is visible at its call sites: `get_chunk_size()` (413),
`predict(data: dict) -> {'audio', 'status', 'cached_audio', 'time_stamp'}`
(476-477) with status in {'ipu_sl','ipu_cl','ipu_el', None}, and `reset()`
(208). The pinned silero-vad 5.1.2 cannot be shipped here (no weights), so this
module provides:

- `EnergyVAD`: a deterministic streaming detector (adaptive noise floor,
  speech-pad onset replay from a history ring, hangover-based end-of-IPU) that
  satisfies the same contract and timing config (configs yaml: threshold 0.5,
  min_silent 0.5s, speech_pad 0.03s, history 2 chunks);
- a pluggable interface so a learned JAX VAD can drop in later.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import VADConfig


class EnergyVAD:
    """Adaptive-energy streaming VAD emitting IPU lifecycle statuses."""

    def __init__(self, cfg: VADConfig = VADConfig()):
        self.cfg = cfg
        self.chunk = cfg.chunk_size
        self.min_silence_chunks = max(
            1, int(cfg.min_silence_s * cfg.sample_rate / self.chunk))
        self.reset()

    def get_chunk_size(self) -> int:
        return self.chunk

    def reset(self) -> None:
        self.in_speech = False
        self.silence_run = 0
        self.noise_floor = 1e-4  # running RMS estimate of background
        self._calibrated = False
        self.history: list = []  # last N chunks for onset replay

    def _prob(self, audio: np.ndarray) -> float:
        """Pseudo-probability of speech from energy over the noise floor."""
        rms = float(np.sqrt(np.mean(np.square(audio)) + 1e-12))
        if not self._calibrated:
            # first chunk calibrates the floor so ambient noise never
            # false-starts an IPU; cap it so a stream that OPENS with speech
            # (e.g. the system identity fed synthesized audio) still detects
            self.noise_floor = max(min(rms, 0.01), 1e-5)
            self._calibrated = True
        # slow noise-floor tracking (only adapts on quiet frames)
        if rms < 3.0 * self.noise_floor:
            self.noise_floor = 0.95 * self.noise_floor + 0.05 * rms
        snr = rms / (self.noise_floor + 1e-8)
        return float(1.0 / (1.0 + np.exp(-(snr - 4.0))))

    def predict(self, data: dict) -> dict:
        """data: {'audio': float32 [chunk], 'time_stamp': float, ...}.
        Returns the annotated dict per the PureVAD contract."""
        audio = np.asarray(data["audio"], np.float32)
        prob = self._prob(audio)
        is_speech = prob > self.cfg.threshold

        status: Optional[str] = None
        cached: list = []
        if not self.in_speech:
            if is_speech:
                self.in_speech = True
                self.silence_run = 0
                status = "ipu_sl"
                cached = list(self.history)  # speech-pad onset replay
            else:
                self.history.append(audio)
                if len(self.history) > self.cfg.history_cache_chunks:
                    self.history.pop(0)
        else:
            if is_speech:
                self.silence_run = 0
                status = "ipu_cl"
            else:
                self.silence_run += 1
                if self.silence_run >= self.min_silence_chunks:
                    self.in_speech = False
                    self.silence_run = 0
                    self.history = []
                    status = "ipu_el"
                else:
                    status = "ipu_cl"  # hangover: still inside the IPU

        return {
            "audio": audio,
            "status": status,
            "cached_audio": cached,
            "time_stamp": data.get("time_stamp"),
            "prob": prob,
        }
