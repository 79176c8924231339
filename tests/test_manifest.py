"""Manifest training-data pipeline: bucketing, silence padding, prefetch.

The reference ships no training pipeline; the manifest format is the one its
evaluations consume (wav<TAB>transcript, bin/asr_eval.py). These tests build
real wav files and check the TPU-facing contracts: static bucket shapes,
sample-space silence padding that leaves real frames bit-identical, CTC
feasibility filtering, and the prefetch thread's transparency.
"""

import os

import numpy as np
import pytest

from freeze_omni_tpu.config import FbankConfig, tiny_system
from freeze_omni_tpu.frontend.fbank import fbank_ref, num_frames
from freeze_omni_tpu.frontend.wav import write_wav
from freeze_omni_tpu.training import manifest as mani
from freeze_omni_tpu.utils.tokenizer import ByteTokenizer

MCFG = mani.ManifestConfig(frame_buckets=(64, 128), text_buckets=(8, 16))


def _make_corpus(tmp_path, rows):
    """rows: list of (num_samples, sample_rate, transcript)."""
    lines = []
    rng = np.random.RandomState(0)
    for i, (n, sr, text) in enumerate(rows):
        path = str(tmp_path / f"u{i}.wav")
        wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)
               + 0.05 * rng.randn(n)).astype(np.float32)
        write_wav(path, wav, sr)
        lines.append(f"{path}\t{text}")
    man = str(tmp_path / "train.tsv")
    with open(man, "w") as f:
        f.write("# comment line\n" + "\n".join(lines) + "\n")
    return man


class TestFeaturize:
    def test_bucket_shape_and_true_frames(self, tmp_path):
        cfg = tiny_system().audio_llm
        fcfg = FbankConfig(num_mel_bins=cfg.encoder.input_dim)
        man = _make_corpus(tmp_path, [(16000, 16000, "hello")])
        wav_path, text = mani.read_manifest(man)[0]
        u = mani.featurize(wav_path, text, ByteTokenizer(512), fcfg, MCFG)
        assert u.fbank.shape == (128, 80)  # 16000 samples -> 98 frames -> 128
        assert u.n_frames == num_frames(fcfg, 16000)
        assert u.tokens.tolist() == ByteTokenizer(512).encode("hello")

    def test_silence_padding_preserves_real_frames(self, tmp_path):
        """Padding happens in sample space: the first n_frames of the padded
        fbank must equal fbank of the raw waveform exactly."""
        cfg = tiny_system().audio_llm
        fcfg = FbankConfig(num_mel_bins=cfg.encoder.input_dim)
        man = _make_corpus(tmp_path, [(7000, 16000, "abc")])
        wav_path, text = mani.read_manifest(man)[0]
        u = mani.featurize(wav_path, text, ByteTokenizer(512), fcfg, MCFG)
        from freeze_omni_tpu.frontend.wav import read_wav
        raw, _ = read_wav(wav_path)
        ref = fbank_ref(raw * 32768.0, fcfg)
        np.testing.assert_array_equal(u.fbank[: u.n_frames], ref)

    def test_resamples_to_16k(self, tmp_path):
        cfg = tiny_system().audio_llm
        fcfg = FbankConfig(num_mel_bins=cfg.encoder.input_dim)
        man = _make_corpus(tmp_path, [(8000, 8000, "x")])  # 1 s at 8 kHz
        wav_path, text = mani.read_manifest(man)[0]
        u = mani.featurize(wav_path, text, ByteTokenizer(512), fcfg, MCFG)
        # 1 s of audio -> ~98 frames regardless of source rate
        assert abs(u.n_frames - 98) <= 1


class TestBatches:
    def _manifest(self, tmp_path):
        return _make_corpus(tmp_path, [
            (7000, 16000, "hello"),
            (9000, 16000, "hi"),
            (16000, 16000, "a longer one"),
            (6000, 16000, "yo"),
            (15000, 16000, "greetings"),
        ])

    def test_ctc_batches_static_shapes(self, tmp_path):
        cfg = tiny_system().audio_llm
        man = self._manifest(tmp_path)
        got = list(mani.manifest_batches(
            "ctc", man, ByteTokenizer(512), cfg, batch=2, mcfg=MCFG, seed=1))
        assert got, "no batches"
        shapes = set()
        for b in got:
            B, T, D = b["fbank"].shape
            assert B == 2 and D == 80 and T in MCFG.frame_buckets
            assert b["tokens"].shape[1] in MCFG.text_buckets
            assert (b["token_lens"] <= b["tokens"].shape[1]).all()
            assert (b["fbank_lens"] <= T).all() and (b["fbank_lens"] > 0).all()
            shapes.add((T, b["tokens"].shape[1]))
        assert len(shapes) <= len(MCFG.frame_buckets) * len(MCFG.text_buckets)

    def test_remainder_padded_with_repeats(self, tmp_path):
        cfg = tiny_system().audio_llm
        man = self._manifest(tmp_path)  # 5 rows, batch 4 -> repeats happen
        got = list(mani.manifest_batches(
            "align", man, ByteTokenizer(512), cfg, batch=4,
            mcfg=mani.ManifestConfig(frame_buckets=(128,), text_buckets=(16,),
                                     shuffle=False)))
        assert len(got) == 2 and all(b["fbank"].shape[0] == 4 for b in got)
        # second batch padded by repeating its single real row
        tail = got[1]
        assert (tail["text_ids"][0] == tail["text_ids"][1]).all()

    def test_align_mask_matches_lengths(self, tmp_path):
        cfg = tiny_system().audio_llm
        tok = ByteTokenizer(512)
        man = self._manifest(tmp_path)
        b = next(iter(mani.manifest_batches(
            "align", man, tok, cfg, batch=2, mcfg=MCFG, seed=0)))
        lens = b["text_mask"].sum(axis=1)
        for i in range(2):
            row = b["text_ids"][i][: lens[i]]
            assert tok.decode(row.tolist())  # real tokens under the mask

    def test_state_stage_rejected(self, tmp_path):
        cfg = tiny_system().audio_llm
        man = self._manifest(tmp_path)
        with pytest.raises(ValueError, match="duplex chunk labels"):
            next(iter(mani.manifest_batches(
                "state", man, ByteTokenizer(512), cfg, batch=2)))

    def test_ctc_infeasible_rows_skipped(self, tmp_path):
        """A clip too short for its target length is dropped, not trained."""
        cfg = tiny_system().audio_llm
        man = _make_corpus(tmp_path, [
            (1200, 16000, "way too long a transcript for 6 frames"),
            (16000, 16000, "ok"),
        ])
        got = list(mani.manifest_batches(
            "ctc", man, ByteTokenizer(512), cfg, batch=1, mcfg=MCFG))
        texts = {tuple(b["tokens"][0, : b["token_lens"][0]].tolist())
                 for b in got}
        assert tuple(ByteTokenizer(512).encode("ok")) in texts
        assert all(b["token_lens"][0] <= 2 for b in got)


class TestPrefetch:
    def test_transparent(self):
        items = [{"a": np.full((2,), i)} for i in range(7)]
        out = list(mani.prefetch(iter(items), depth=2))
        assert len(out) == 7
        for i, b in enumerate(out):
            np.testing.assert_array_equal(b["a"], items[i]["a"])

    def test_exception_propagates(self):
        def gen():
            yield {"a": np.zeros(1)}
            raise RuntimeError("loader broke")

        it = mani.prefetch(gen())
        next(it)
        with pytest.raises(RuntimeError, match="loader broke"):
            next(it)


class TestTrainOnManifest:
    def test_ctc_step_runs_and_improves(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from freeze_omni_tpu.models import audio_llm
        from freeze_omni_tpu.training import train_step as ts

        cfg = tiny_system().audio_llm
        tok = ByteTokenizer(512)
        man = _make_corpus(tmp_path, [(7000, 16000, "hi"),
                                      (7100, 16000, "yo")])
        b = next(iter(mani.manifest_batches(
            "ctc", man, tok, cfg, batch=2,
            mcfg=mani.ManifestConfig(frame_buckets=(64,), text_buckets=(8,)),
            seed=0)))
        vocab = int(b["tokens"].max()) + 1
        params = audio_llm.init_params(jax.random.PRNGKey(0), cfg)
        trainable = {
            "encoder_user": params["encoder_user"],
            "ctc_head": ts.init_ctc_head(jax.random.PRNGKey(2), cfg, vocab),
        }
        opt = ts.make_optimizer(lr=3e-3)
        state = ts.init_train_state(trainable, opt)
        step = jax.jit(
            lambda s, bb: ts.stage_step("ctc", s, {}, opt, cfg, None, bb))
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        losses = []
        for _ in range(6):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
