import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.config import tiny_system
from freeze_omni_tpu.models import audio_llm, codec as codec_mod
from freeze_omni_tpu.models import speech_decoder as sd
from freeze_omni_tpu.pipeline import InferencePipeline
from freeze_omni_tpu.tts import StreamingTTS, find_min_seam


class TestSeamSplicing:
    def test_quiet_point_splits(self):
        """A silent valley past the midpoint becomes the splice point."""
        buffer = np.ones((1, 1, 100), np.float32) * 0.5
        syn = np.ones((1, 1, 4000), np.float32) * 0.5
        syn[0, 0, 2900:3100] = 0.0  # quiet valley in the second half
        new_buf, emitted = find_min_seam(buffer, syn, N=101, threshold=0.1)
        assert emitted is not None
        # emitted = buffer + syn[:cut]; cut inside the valley
        cut = emitted.shape[-1] - 100
        assert 2900 <= cut <= 3100
        assert new_buf.shape[-1] == 4000 - cut

    def test_loud_chunk_buffers(self):
        buffer = np.zeros((1, 1, 50), np.float32)
        syn = np.ones((1, 1, 3000), np.float32) * 0.5  # uniformly loud
        new_buf, emitted = find_min_seam(buffer, syn, N=101, threshold=0.01)
        assert emitted is None
        assert new_buf.shape[-1] == 3050


class TestGenerateSegmentParity:
    def test_segment_matches_per_token_cache_growth(self):
        """generate_segment must advance the KV cache exactly like n
        generate_step calls (token values differ only through RNG usage)."""
        cfg = tiny_system().audio_llm
        params = audio_llm.init_params(jax.random.PRNGKey(0), cfg)
        from freeze_omni_tpu.models import qwen2

        kv = qwen2.init_cache(cfg.llm, 1, dtype=jnp.float32)
        ids = jnp.arange(6)[None]
        kv = audio_llm.prefill_tokens(params, cfg, ids, kv)
        base = int(kv.length[0])

        toks, hiddens, done, kv2 = audio_llm.generate_segment(
            params, cfg, jnp.asarray([3]), kv, jax.random.PRNGKey(1),
            tiny_system().sampling, n_steps=5, eod_id=-1)
        assert toks.shape == (1, 5)
        assert hiddens.shape[1] == 5
        assert int(kv2.length[0]) == base + 5
        assert not bool(done[0])

    def test_segment_stops_at_eod(self):
        cfg = tiny_system().audio_llm
        params = audio_llm.init_params(jax.random.PRNGKey(0), cfg)
        from freeze_omni_tpu.models import qwen2

        kv = qwen2.init_cache(cfg.llm, 1, dtype=jnp.float32)
        kv = audio_llm.prefill_tokens(params, cfg, jnp.arange(4)[None], kv)
        base = int(kv.length[0])
        # force every sampled token to be "eod" by passing the argmax id as eod:
        # run once to find the first sampled token, then use it as eod
        toks, _, _, _ = audio_llm.generate_segment(
            params, cfg, jnp.asarray([1]), kv, jax.random.PRNGKey(2),
            tiny_system().sampling, n_steps=1, eod_id=-1)
        eod = int(np.asarray(toks)[0, 0])
        toks2, _, done, kv2 = audio_llm.generate_segment(
            params, cfg, jnp.asarray([1]), kv, jax.random.PRNGKey(2),
            tiny_system().sampling, n_steps=6, eod_id=eod)
        seq = list(np.asarray(toks2)[0])
        assert seq[0] == eod and all(t == eod for t in seq)
        assert bool(done[0])
        # cache grew by 1 (the pre-eod forward); eod repeats are masked writes
        assert int(kv2.length[0]) == base + 1


class TestBucketedVocoder:
    def test_tts_run_produces_audio_and_stops(self):
        sys_cfg = tiny_system()
        import dataclasses

        cfg = dataclasses.replace(sys_cfg.tts, max_tokens=32, seam_threshold=1e9)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        tts = StreamingTTS({"decoder": sd.init_params(k1, cfg.decoder),
                            "codec": codec_mod.init_params(k2, cfg.codec)}, cfg)
        hidden = np.random.RandomState(0).randn(1, 8, cfg.decoder.idim)
        segs = list(tts.run(hidden.astype(np.float32),
                            prefix=hidden.astype(np.float32)))
        assert segs, "no audio produced"
        total = sum(s.shape[-1] for s in segs)
        assert total > 0
        for s in segs:
            assert np.isfinite(s).all() and np.abs(s).max() <= 1.0


class TestVoicePrompt:
    """TiCodec GST voice prompts: extract_global_tokens + set_global_tokens
    (the reference's VQVAE global branch, models.py:475-514/617-637, exposed
    as a user-facing voice control)."""

    def test_extract_is_deterministic_and_input_sensitive(self):
        from freeze_omni_tpu import tts as tts_mod
        from freeze_omni_tpu.models import codec as codec_mod

        cfg = tiny_system().tts.codec
        params = codec_mod.init_params(jax.random.PRNGKey(0), cfg,
                                       with_encoder=True)
        rng = np.random.RandomState(0)
        a = (0.3 * np.sin(np.arange(8000) / 15)).astype(np.float32)
        b = (0.2 * rng.randn(8000)).astype(np.float32)
        ga1 = tts_mod.extract_global_tokens(params, cfg, a, 16000)
        ga2 = tts_mod.extract_global_tokens(params, cfg, a, 16000)
        gb = tts_mod.extract_global_tokens(params, cfg, b, 16000)
        assert ga1 == ga2
        assert len(ga1) == cfg.global_code_num
        assert all(0 <= t < cfg.n_codes for t in ga1)
        assert len(gb) == len(ga1)  # (token VALUES are weights-dependent)

    def test_extract_requires_encoder_branch(self):
        from freeze_omni_tpu import tts as tts_mod
        from freeze_omni_tpu.models import codec as codec_mod

        cfg = tiny_system().tts.codec
        params = codec_mod.init_params(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="encoder branch"):
            tts_mod.extract_global_tokens(
                params, cfg, np.zeros(4000, np.float32), 16000)

    def test_voice_changes_synthesis(self):
        from freeze_omni_tpu.tts import StreamingTTS
        from freeze_omni_tpu.models import codec as codec_mod
        from freeze_omni_tpu.models import speech_decoder as sd

        cfg = tiny_system().tts
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        params = {"decoder": sd.init_params(k1, cfg.decoder),
                  "codec": codec_mod.init_params(k2, cfg.codec)}

        def synth(gst):
            tts = StreamingTTS(params, cfg, seed=0)
            tts.set_global_tokens(gst)
            hidden = np.random.RandomState(5).randn(
                1, 4, cfg.decoder.idim).astype(np.float32)
            return np.concatenate([s[0, 0] for s in tts.run(hidden)])

        a = synth([0] * cfg.codec.global_code_num)
        b = synth([cfg.codec.n_codes - 1] * cfg.codec.global_code_num)
        n = min(a.shape[0], b.shape[0])
        assert n > 0
        # the generator conditions on the GST embedding: a different voice
        # must change the waveform
        assert np.abs(a[:n] - b[:n]).max() > 1e-6
