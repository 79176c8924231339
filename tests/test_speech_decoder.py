import jax
import jax.numpy as jnp
import numpy as np

from freeze_omni_tpu.config import CodecConfig, SpeechDecoderConfig
from freeze_omni_tpu.models import codec as codec_mod
from freeze_omni_tpu.models import speech_decoder as sd


def _cfg():
    return SpeechDecoderConfig(idim=64, hidden=64, num_layers=2, num_heads=4,
                               ffn=128, codec_vocab=32, max_kv_len=128)


class TestSpeechDecoder:
    def test_block_prefill_equals_stepwise(self):
        """One-shot causal prefill must build the same KV cache as feeding the
        same embeddings one token at a time."""
        cfg = _cfg()
        params = sd.init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 5, 64), jnp.float32)

        c1 = sd.init_cache(cfg, 1)
        h1, c1 = sd.prefill(params, cfg, x, jnp.ones((1, 5), bool), c1)

        c2 = sd.init_cache(cfg, 1)
        hs = []
        for i in range(5):
            h, c2 = sd.prefill(params, cfg, x[:, i : i + 1], jnp.ones((1, 1), bool), c2)
            hs.append(h)
        np.testing.assert_allclose(np.asarray(c1.kv.k)[:, :, :5],
                                   np.asarray(c2.kv.k)[:, :, :5], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(h1)[:, -1], np.asarray(hs[-1])[:, 0],
                                   rtol=2e-4, atol=2e-4)

    def test_prefix_offsets_rope_only(self):
        """With a KV prefix, main-stack RoPE positions restart at 0
        (decoder.py:337-341): the first main token must use position 0."""
        cfg = _cfg()
        params = sd.init_params(jax.random.PRNGKey(1), cfg)
        rng = np.random.RandomState(1)
        prefix = jnp.asarray(rng.randn(1, 4, 64), jnp.float32)
        x = jnp.asarray(rng.randn(1, 3, 64), jnp.float32)

        cache = sd.init_cache(cfg, 1)
        cache = sd.prefix_prefill(params, cfg, prefix, jnp.ones((1, 4), bool), cache)
        assert int(cache.prefix_len[0]) == 4
        assert int(cache.kv.length[0]) == 4
        h, cache = sd.prefill(params, cfg, x, jnp.ones((1, 3), bool), cache)
        assert h.shape == (1, 3, 64)
        assert int(cache.kv.length[0]) == 7

    def test_decode_segment_runs_and_stops(self):
        cfg = _cfg()
        params = sd.init_params(jax.random.PRNGKey(2), cfg)
        rng = np.random.RandomState(2)
        hidden = jnp.asarray(rng.randn(1, 6, 64), jnp.float32)

        pre = sd.pre_nn(params, cfg, hidden)
        assert pre.shape == (1, 6, 64)

        cache = sd.init_cache(cfg, 1)
        cache = sd.prefix_prefill(params, cfg, hidden, jnp.ones((1, 6), bool), cache)
        bos = sd.embedding(params["embedding"], jnp.full((1, 1), cfg.bos_id))
        block = jnp.concatenate([bos, pre], axis=1)
        _, cache = sd.prefill(params, cfg, block, jnp.ones((1, 7), bool), cache)

        st = sd.init_decode_state(cfg, cache, penalty_window=4)
        toks, st = sd.decode_segment(params, cfg, st, jax.random.PRNGKey(0),
                                     n_steps=10, top_k=2, penalty_window=4,
                                     penalty=1.1)
        assert toks.shape == (1, 10)
        assert np.all(np.asarray(toks) < cfg.full_vocab)
        # determinism
        st2 = sd.init_decode_state(cfg, cache, penalty_window=4)
        toks2, _ = sd.decode_segment(params, cfg, st2, jax.random.PRNGKey(0),
                                     n_steps=10, top_k=2, penalty_window=4,
                                     penalty=1.1)
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


class TestCodec:
    def _cfg(self):
        return CodecConfig(
            upsample_rates=(8, 5, 5, 3), upsample_kernel_sizes=(16, 10, 10, 6),
            upsample_initial_channel=64, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),), n_codes=16, global_code_num=2,
            global_feature_dim=16, global_feature_conv=(128, 16, 16, 3, 1),
            global_tokens=(0, 0),
        )

    def test_decode_shapes(self):
        cfg = self._cfg()
        assert cfg.upsample_rate == 600
        params = codec_mod.init_params(jax.random.PRNGKey(0), cfg)
        codes = jnp.zeros((1, 8, 1), jnp.int32)
        gst = jnp.zeros((1, 1, 2), jnp.int32)
        wav = codec_mod.decode(params, cfg, codes, gst)
        # torch ConvTranspose1d length: (T-1)*u - 2*((k-u)//2) + k per stage
        t = 8
        for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
            t = (t - 1) * u - 2 * ((k - u) // 2) + k
        assert wav.shape == (1, 1, t)
        # length deviates from nominal 600/token only by a constant offset
        # (odd kernel-stride differences), independent of T
        t2 = 16
        for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
            t2 = (t2 - 1) * u - 2 * ((k - u) // 2) + k
        assert (t - 8 * 600) == (t2 - 16 * 600)
        assert float(jnp.max(jnp.abs(wav))) <= 1.0

    def test_quantize_embed_roundtrip(self):
        cfg = self._cfg()
        params = codec_mod.init_params(jax.random.PRNGKey(1), cfg)
        codes = jnp.asarray(np.random.RandomState(0).randint(0, 16, (2, 5, 1)))
        quant = codec_mod.quantizer_embed(params["quantizer"], cfg, codes)
        assert quant.shape == (2, 64 * 8, 5) or quant.shape == (2, 512, 5)
        # nearest-neighbour of an exact codebook vector is itself
        codes2, _ = codec_mod.quantize(
            params["quantizer"], cfg, quant,
            jnp.zeros((2, cfg.global_feature_dim)))
        np.testing.assert_array_equal(np.asarray(codes2), np.asarray(codes))

    def test_encode_decode_roundtrip_shapes(self):
        cfg = self._cfg()
        params = codec_mod.init_params(jax.random.PRNGKey(2), cfg, with_encoder=True)
        wav = jnp.asarray(np.random.RandomState(1).randn(1, 1, 600 * 4), jnp.float32)
        codes, gst = codec_mod.encode(params, cfg, wav)
        # strided-conv arithmetic loses a few frames at the edges (same as the
        # reference encoder): 2400 samples -> 3-4 tokens at 40 Hz
        assert codes.shape[0] == 1 and codes.shape[2] == 1
        assert 3 <= codes.shape[1] <= 4
        assert gst.shape == (1, 1, 2)
        out = codec_mod.decode(params, cfg, codes, gst)
        assert out.shape[2] >= 600 * (codes.shape[1] - 1)
