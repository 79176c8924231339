"""ctypes bindings for the native (C++) audio frontend.

Drop-in replacements for the Python/JAX host-side feature path: `NativeFbank`
computes Kaldi-compatible log-mel features and `NativeChunker` runs the
streaming waveform/feature ring of the reference chunkers in one C call per
chunk. Builds on demand with g++ (native/build.sh); `available()` gates use so
the pure-JAX path remains the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libfofrontend.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    script = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                          "build.sh")
    script = os.path.abspath(script)
    if not os.path.exists(script):
        return False
    try:
        subprocess.run(["bash", script], check=True, capture_output=True,
                       timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if not (hasattr(lib, "resample_create") and hasattr(lib, "vad_create")):
        # stale library from before the newest kernels were added: rebuild once
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        if not (hasattr(lib, "resample_create") and hasattr(lib, "vad_create")):
            return None
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.fbank_create.restype = ctypes.c_void_p
    lib.fbank_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_double,
                                 ctypes.c_double]
    lib.fbank_destroy.argtypes = [ctypes.c_void_p]
    lib.fbank_num_frames.restype = ctypes.c_int
    lib.fbank_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.fbank_compute.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int, f32p]
    lib.chunker_create.restype = ctypes.c_void_p
    lib.chunker_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_double,
                                   ctypes.c_double, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_double]
    lib.chunker_destroy.argtypes = [ctypes.c_void_p]
    lib.chunker_chunk_samples.restype = ctypes.c_int
    lib.chunker_chunk_samples.argtypes = [ctypes.c_void_p]
    lib.chunker_frames_per_step.restype = ctypes.c_int
    lib.chunker_frames_per_step.argtypes = [ctypes.c_void_p]
    lib.chunker_reset.argtypes = [ctypes.c_void_p]
    lib.chunker_process.argtypes = [ctypes.c_void_p, f32p, f32p]
    lib.resample_create.restype = ctypes.c_void_p
    lib.resample_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_double]
    lib.resample_destroy.argtypes = [ctypes.c_void_p]
    lib.resample_reset.argtypes = [ctypes.c_void_p]
    lib.resample_out_len.restype = ctypes.c_longlong
    lib.resample_out_len.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
    lib.resample_push_cap.restype = ctypes.c_longlong
    lib.resample_push_cap.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
    lib.resample_push.restype = ctypes.c_longlong
    lib.resample_push.argtypes = [ctypes.c_void_p, f32p, ctypes.c_longlong,
                                  f32p]
    lib.resample_flush_cap.restype = ctypes.c_longlong
    lib.resample_flush_cap.argtypes = [ctypes.c_void_p]
    lib.resample_flush.restype = ctypes.c_longlong
    lib.resample_flush.argtypes = [ctypes.c_void_p, f32p]
    lib.resample_compute.argtypes = [ctypes.c_void_p, f32p, ctypes.c_longlong,
                                     f32p]
    lib.vad_create.restype = ctypes.c_void_p
    lib.vad_create.argtypes = [ctypes.c_int, ctypes.c_double, ctypes.c_double,
                               ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
                               f32p, f32p, f32p, f32p, ctypes.c_float, f32p,
                               f32p]
    lib.vad_destroy.argtypes = [ctypes.c_void_p]
    lib.vad_reset.argtypes = [ctypes.c_void_p]
    lib.vad_push.restype = ctypes.c_int
    lib.vad_push.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeFbank:
    def __init__(self, sample_rate: int = 16000, num_bins: int = 80,
                 frame_ms: float = 25.0, shift_ms: float = 10.0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frontend unavailable (g++ build failed)")
        self._lib = lib
        self._h = lib.fbank_create(sample_rate, num_bins, frame_ms, shift_ms)
        self.num_bins = num_bins

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fbank_destroy(self._h)
            self._h = None

    def __call__(self, wave: np.ndarray) -> np.ndarray:
        """wave: [n] float32 (scaled, e.g. x32768) -> [m, num_bins]."""
        wave = np.ascontiguousarray(wave, np.float32)
        m = self._lib.fbank_num_frames(self._h, wave.shape[0])
        out = np.empty((m, self.num_bins), np.float32)
        if m:
            self._lib.fbank_compute(self._h, _ptr(wave), wave.shape[0], _ptr(out))
        return out


class NativeChunker:
    """Streaming chunker: one C call per chunk returns the model input window.

    scale=32768 + 16/3 frames reproduces the offline audioEncoderProcessor;
    scale=32767 + 28/4 frames reproduces the duplex AudioFeatureGating."""

    def __init__(self, sample_rate: int = 16000, num_bins: int = 80,
                 frame_ms: float = 25.0, shift_ms: float = 10.0,
                 steps_per_chunk: int = 16, context_steps: int = 3,
                 scale: float = 32768.0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frontend unavailable (g++ build failed)")
        self._lib = lib
        self._h = lib.chunker_create(sample_rate, num_bins, frame_ms, shift_ms,
                                     steps_per_chunk, context_steps, scale)
        self.num_bins = num_bins
        self.chunk_samples = lib.chunker_chunk_samples(self._h)
        self.frames = lib.chunker_frames_per_step(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.chunker_destroy(self._h)
            self._h = None

    def reset(self) -> None:
        self._lib.chunker_reset(self._h)

    def process(self, audio: np.ndarray) -> np.ndarray:
        """audio: [chunk_samples] float in [-1,1] -> [1, frames, num_bins]."""
        audio = np.ascontiguousarray(audio, np.float32)
        assert audio.shape[0] == self.chunk_samples, \
            f"expected {self.chunk_samples} samples, got {audio.shape[0]}"
        out = np.empty((self.frames, self.num_bins), np.float32)
        self._lib.chunker_process(self._h, _ptr(audio), _ptr(out))
        return out[None]


class NativeVAD:
    """Streaming learned-VAD probability core (native/frontend/vad.cc).

    The full probability path of duplex/vad.LearnedVAD._prob — carry buffer,
    16/8 ms log-mel fbank, per-frame GRU, output sigmoid — in one C call per
    chunk (~30x the Python loop's throughput; the Python path is ~3 host
    cores at 128 duplex streams)."""

    def __init__(self, params: dict, sample_rate: int = 16000,
                 frame_ms: float = 16.0, shift_ms: float = 8.0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frontend unavailable (g++ build failed)")
        self._lib = lib
        p = {k: np.ascontiguousarray(np.asarray(v, np.float32).reshape(
            np.asarray(v).shape[0], -1) if np.asarray(v).ndim > 1 else
            np.asarray(v, np.float32).ravel()) for k, v in params.items()}
        num_bins = p["mean"].shape[0]
        hidden = p["wz"].shape[-1] if p["wz"].ndim > 1 else p["bz"].shape[0]
        self._h = lib.vad_create(
            sample_rate, frame_ms, shift_ms, num_bins, hidden,
            _ptr(p["wz"]), _ptr(p["wr"]), _ptr(p["wh"]), _ptr(p["bz"]),
            _ptr(p["br"]), _ptr(p["bh"]), _ptr(p["wo"]),
            float(np.asarray(params["bo"]).ravel()[0]), _ptr(p["mean"]),
            _ptr(p["scale"]))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vad_destroy(self._h)
            self._h = None

    def reset(self) -> None:
        self._lib.vad_reset(self._h)

    def push(self, audio: np.ndarray):
        """audio: [n] float in [-1,1] -> mean frame speech prob, or None if
        the samples were buffered (not yet one full fbank frame)."""
        audio = np.ascontiguousarray(audio, np.float32)
        out = np.empty((1,), np.float32)
        got = self._lib.vad_push(self._h, _ptr(audio), audio.shape[0],
                                 _ptr(out))
        return float(out[0]) if got else None


class NativeResampler:
    """Streaming polyphase resampler (native/frontend/resample.cc).

    Same filter design as frontend/wav.py::resample (torchaudio
    sinc_interp_hann, the reference's bin/inference.py:110). `push` emits every
    output sample whose kernel support is complete; `flush` zero-pads the tail
    and truncates to the exact one-shot length, so push*+flush concatenates to
    exactly `wav.resample(full_signal)`."""

    def __init__(self, orig_sr: int, new_sr: int,
                 lowpass_filter_width: int = 6, rolloff: float = 0.99):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frontend unavailable (g++ build failed)")
        self._lib = lib
        self._h = lib.resample_create(orig_sr, new_sr, lowpass_filter_width,
                                      rolloff)
        if not self._h:
            raise ValueError(f"bad rates {orig_sr}->{new_sr}")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.resample_destroy(self._h)
            self._h = None

    def reset(self) -> None:
        self._lib.resample_reset(self._h)

    def push(self, audio: np.ndarray) -> np.ndarray:
        audio = np.ascontiguousarray(audio, np.float32)
        n = audio.shape[0]
        out = np.empty(self._lib.resample_push_cap(self._h, n), np.float32)
        wrote = self._lib.resample_push(self._h, _ptr(audio), n, _ptr(out))
        return out[:wrote]

    def flush(self) -> np.ndarray:
        out = np.empty(max(1, self._lib.resample_flush_cap(self._h)),
                       np.float32)
        wrote = self._lib.resample_flush(self._h, _ptr(out))
        return out[:wrote]

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        """One-shot: resample the whole signal on a fresh state."""
        audio = np.ascontiguousarray(audio, np.float32)
        n = audio.shape[0]
        out = np.empty(self._lib.resample_out_len(self._h, n), np.float32)
        self._lib.resample_compute(self._h, _ptr(audio), n, _ptr(out))
        return out
