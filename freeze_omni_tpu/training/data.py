"""Training data utilities: synthetic duplex fixtures + batching.

The reference has no training data pipeline in-repo, and its chat.json is a
dev artifact, not dialogue data (SURVEY.md §0.4) — so workloads here are
synthetic duplex-audio fixtures: random speech-band fbank streams with
chunk-level dialog-state labels following the system.png scheme (0 =
mid-utterance/continue, 1 = respond, 2 = end-without-response), plus random
codec-token targets for the speech decoder CE.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from ..config import AudioLLMConfig, SpeechDecoderConfig


def synth_audio_llm_batch(seed: int, cfg: AudioLLMConfig, batch: int,
                          fbank_frames: int = 67) -> Dict[str, np.ndarray]:
    """fbank [B, T_f, 80] + per-LLM-chunk labels. Label 1 or 2 goes on the
    final chunk of each utterance, 0 elsewhere (system.png label scheme)."""
    rng = np.random.RandomState(seed)
    t_enc = ((fbank_frames - 1) // 2 - 1) // 2
    t_llm = (t_enc + 1) // 2
    fbank = rng.randn(batch, fbank_frames, cfg.encoder.input_dim).astype(np.float32)
    labels = np.zeros((batch, t_llm), np.int32)
    final = rng.randint(1, 3, size=batch)  # 1=respond, 2=end-no-response
    labels[:, -1] = final
    return {
        "fbank": fbank,
        "labels": labels,
        "label_mask": np.ones((batch, t_llm), bool),
    }


def synth_decoder_batch(seed: int, cfg: SpeechDecoderConfig, batch: int,
                        hidden_len: int = 6, y_len: int = 8
                        ) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    return {
        "dec_hidden": rng.randn(batch, hidden_len, cfg.idim).astype(np.float32),
        "dec_hidden_lens": np.full((batch,), hidden_len, np.int32),
        "dec_y": rng.randint(0, cfg.codec_vocab, (batch, y_len)).astype(np.int32),
        "dec_y_lens": np.full((batch,), y_len - 1, np.int32),
    }


def batches(cfg: AudioLLMConfig, dcfg: SpeechDecoderConfig, batch: int,
            steps: int, seed: int = 0, with_decoder: bool = True
            ) -> Iterator[Dict[str, np.ndarray]]:
    for i in range(steps):
        b = synth_audio_llm_batch(seed + i, cfg, batch)
        if with_decoder:
            b.update(synth_decoder_batch(seed + 1000 + i, dcfg, batch))
        yield b
