import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.config import AdapterConfig, EncoderConfig
from freeze_omni_tpu.models import adapter as adp
from freeze_omni_tpu.models import encoder as enc
from freeze_omni_tpu.models.encoder import _embed, _subsample
from freeze_omni_tpu.models.layers import layer_norm, linear, sinusoidal_pe


def _cfg():
    return EncoderConfig(
        input_dim=80, output_dim=32, attention_dim=32, attention_heads=4,
        linear_units=64, num_blocks=2, chunk_size=4, left_chunks=2, pe_max_len=64,
    )


def _oracle_stream(params, cfg, chunks):
    """Direct dynamic-shape port of the reference streaming algorithm
    (concat-and-trim KV lists, transformer.py:266-285 + attention.py:407-459),
    used as the test oracle for the static-shape `stream_step`."""
    caches = [None] * cfg.num_blocks
    pe_index = 0
    outs = []
    H, dk = cfg.attention_heads, cfg.head_dim
    for xs in chunks:
        xs = (xs - params["cmvn"]["mean"]) * params["cmvn"]["istd"]
        x = _subsample(params["sub"], xs)
        x = _embed(params["embed"], x)
        x = x * math.sqrt(cfg.attention_dim)
        B, T, d = x.shape

        cached = 0 if caches[0] is None else caches[0][0].shape[1]
        pe_index = pe_index % cfg.pe_wrap
        pe_length = cached + T
        start = max(0, pe_index - cfg.full_chunk_size)
        pos_emb = sinusoidal_pe(jnp.arange(start, start + pe_length), d)

        for i in range(cfg.num_blocks):
            bp = jax.tree.map(lambda a: a[i], params["blocks"])
            h = layer_norm(bp["ln1"], x)
            k = linear(bp["k"], h).reshape(B, T, H, dk)
            v = linear(bp["v"], h).reshape(B, T, H, dk)
            if caches[i] is not None:
                k = jnp.concatenate([caches[i][0], k], axis=1)
                v = jnp.concatenate([caches[i][1], v], axis=1)
            caches[i] = (k[:, -cfg.window:], v[:, -cfg.window:])
            q = linear(bp["q"], h).reshape(B, T, H, dk)
            p = linear(bp["pos"], pos_emb).reshape(-1, H, dk)
            ac = jnp.einsum("bthd,bshd->bhts", q + bp["bias_u"], k)
            bd = jnp.einsum("bthd,shd->bhts", q + bp["bias_v"], p)
            attnw = jax.nn.softmax((ac + bd) / math.sqrt(dk), axis=-1)
            att = jnp.einsum("bhts,bshd->bthd", attnw, v).reshape(B, T, d)
            x = x + linear(bp["o"], att)
            h2 = layer_norm(bp["ln2"], x)
            x = x + linear(bp["ffn2"], jax.nn.relu(linear(bp["ffn1"], h2)))

        pe_index = pe_index + cfg.chunk_size
        outs.append(layer_norm(params["after_norm"], x))
    return outs


class TestStreamingEncoder:
    @pytest.mark.slow
    def test_static_stream_matches_dynamic_oracle(self):
        cfg = _cfg()
        key = jax.random.PRNGKey(0)
        params = enc.init_params(key, cfg)
        # realistic cmvn
        params["cmvn"]["mean"] = jnp.full((80,), 2.0)
        params["cmvn"]["istd"] = jnp.full((80,), 0.5)

        rng = np.random.RandomState(0)
        n_steps = 16  # crosses the pe wraparound (pe_wrap = 64 - 12 = 52)
        chunks = [jnp.asarray(rng.randn(1, 19, 80), jnp.float32) for _ in range(n_steps)]

        oracle = _oracle_stream(params, cfg, chunks)

        state = enc.init_state(cfg)
        step = jax.jit(enc.stream_step, static_argnames=("cfg",))
        for i, c in enumerate(chunks):
            out, state = step(params, cfg, c, state)
            np.testing.assert_allclose(np.asarray(out), np.asarray(oracle[i]),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"step {i}")

    def test_stream_step_shapes(self):
        cfg = _cfg()
        params = enc.init_params(jax.random.PRNGKey(1), cfg)
        state = enc.init_state(cfg, batch=2)
        out, state2 = enc.stream_step(params, cfg, jnp.zeros((2, 19, 80)), state)
        assert out.shape == (2, 4, 32)
        assert state2.k_cache.shape == (2, 2, cfg.window, 4, 8)
        assert int(state2.valid[0]) == 4 and int(state2.pe_index[0]) == 4
        # duplex window: 32 fbank frames -> 7 encoder frames
        out, _ = enc.stream_step(params, cfg, jnp.zeros((2, 32, 80)), state)
        assert out.shape == (2, 7, 32)

    def test_batch_forward_shapes_and_mask(self):
        cfg = _cfg()
        params = enc.init_params(jax.random.PRNGKey(2), cfg)
        xs = jnp.asarray(np.random.RandomState(1).randn(2, 67, 80), jnp.float32)
        out = enc.forward(params, cfg, xs)
        assert out.shape == (2, ((67 - 1) // 2 - 1) // 2, 32)

        m = enc.chunk_causal_mask(8, 2, 1)
        expected = np.array([
            [1, 1, 0, 0, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 0, 0, 0],
            [1, 1, 1, 1, 0, 0, 0, 0],
            [1, 1, 1, 1, 0, 0, 0, 0],
            [0, 0, 1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 1, 0, 0],
            [0, 0, 0, 0, 1, 1, 1, 1],
            [0, 0, 0, 0, 1, 1, 1, 1],
        ], dtype=bool)
        np.testing.assert_array_equal(np.asarray(m), expected)


class TestAdapter:
    @pytest.mark.parametrize("cfg", [
        AdapterConfig(enc_out_dim=16, llm_dim=128, kernel_size=5),   # two-stage
        AdapterConfig(enc_out_dim=16, llm_dim=48, kernel_size=5),    # one-stage
        AdapterConfig(enc_out_dim=16, llm_dim=48, kernel_size=5, norm="layer",
                      activation="gelu"),
    ])
    def test_streaming_equals_full(self, cfg):
        params = adp.init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 12, 16), jnp.float32)

        full = adp.forward(params, cfg, x)
        assert full.shape == (2, 6, cfg.llm_dim)

        state = adp.init_state(cfg, batch=2)
        outs = []
        for i in range(3):
            o, state = adp.step(params, cfg, x[:, i * 4 : (i + 1) * 4], state)
            outs.append(o)
        streamed = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)

    def test_odd_chunk_downsampling(self):
        # duplex path: 7 encoder frames -> 4 LLM embeddings
        cfg = AdapterConfig(enc_out_dim=16, llm_dim=128, kernel_size=5)
        params = adp.init_params(jax.random.PRNGKey(1), cfg)
        state = adp.init_state(cfg, batch=1)
        o, state = adp.step(params, cfg, jnp.zeros((1, 7, 16)), state)
        assert o.shape == (1, 4, 128)
        o, _ = adp.step(params, cfg, jnp.zeros((1, 7, 16)), state)
        assert o.shape == (1, 4, 128)
