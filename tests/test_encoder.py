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
    used as the test oracle for the static-shape `stream_step`. Supports both
    pos_enc variants (abs-enc: PE added to inputs, plain dot-product scores)."""
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

        if cfg.pos_enc == "abs-enc":
            pe_index = pe_index % cfg.pe_max_len
            x = x + sinusoidal_pe(jnp.arange(pe_index, pe_index + T), d)[None]
            pos_emb = None
            pe_index = pe_index + T
        else:
            cached = 0 if caches[0] is None else caches[0][0].shape[1]
            pe_index = pe_index % cfg.pe_wrap
            pe_length = cached + T
            start = max(0, pe_index - cfg.full_chunk_size)
            pos_emb = sinusoidal_pe(jnp.arange(start, start + pe_length), d)
            pe_index = pe_index + cfg.chunk_size

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
            if cfg.pos_enc == "abs-enc":
                scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(dk)
            else:
                p = linear(bp["pos"], pos_emb).reshape(-1, H, dk)
                ac = jnp.einsum("bthd,bshd->bhts", q + bp["bias_u"], k)
                bd = jnp.einsum("bthd,shd->bhts", q + bp["bias_v"], p)
                scores = (ac + bd) / math.sqrt(dk)
            attnw = jax.nn.softmax(scores, axis=-1)
            att = jnp.einsum("bhts,bshd->bthd", attnw, v).reshape(B, T, d)
            x = x + linear(bp["o"], att)
            h2 = layer_norm(bp["ln2"], x)
            x = x + linear(bp["ffn2"], jax.nn.relu(linear(bp["ffn1"], h2)))

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


class TestAbsEncEncoder:
    """abs-enc PositionalEncoding variant (attention.py:7-68): PE added to the
    scaled inputs, plain dot-product attention, no linear_pos/pos biases."""

    def _cfg(self):
        return EncoderConfig(
            input_dim=80, output_dim=32, attention_dim=32, attention_heads=4,
            linear_units=64, num_blocks=2, chunk_size=4, left_chunks=2,
            pe_max_len=64, pos_enc="abs-enc")

    def test_unknown_pos_enc_rejected(self):
        with pytest.raises(ValueError, match="pos_enc"):
            EncoderConfig(pos_enc="rotary")

    def test_abs_params_have_no_rel_tables(self):
        params = enc.init_params(jax.random.PRNGKey(0), self._cfg())
        assert "pos" not in params["blocks"]
        assert "bias_u" not in params["blocks"]

    def test_abs_stream_matches_dynamic_oracle(self):
        cfg = self._cfg()
        params = enc.init_params(jax.random.PRNGKey(3), cfg)
        params["cmvn"]["mean"] = jnp.full((80,), 1.0)
        params["cmvn"]["istd"] = jnp.full((80,), 0.7)
        rng = np.random.RandomState(3)
        chunks = [jnp.asarray(rng.randn(1, 19, 80), jnp.float32)
                  for _ in range(6)]

        oracle = _oracle_stream(params, cfg, chunks)
        state = enc.init_state(cfg)
        step = jax.jit(enc.stream_step, static_argnames=("cfg",))
        for i, c in enumerate(chunks):
            out, state = step(params, cfg, c, state)
            np.testing.assert_allclose(np.asarray(out), np.asarray(oracle[i]),
                                       rtol=2e-4, atol=2e-4, err_msg=f"step {i}")

    def test_abs_forward_matches_torch(self):
        """Batch forward vs an independently-written torch replica of the
        reference abs-enc path (PositionalEncoding.forward x*xscale + pe,
        attention.py:36-52, then plain pre-LN MHA, attention.py:392-393)."""
        import torch

        cfg = EncoderConfig(
            input_dim=80, output_dim=16, attention_dim=16, attention_heads=2,
            linear_units=32, num_blocks=1, chunk_size=4, left_chunks=2,
            pe_max_len=256, pos_enc="abs-enc")
        torch.manual_seed(5)
        d, h, dk, T = 16, 2, 8, 8
        lq, lk, lv, lo = (torch.nn.Linear(d, d) for _ in range(4))
        n1, n2 = torch.nn.LayerNorm(d), torch.nn.LayerNorm(d)
        w1, w2 = torch.nn.Linear(d, 32), torch.nn.Linear(32, d)

        x0 = torch.randn(1, T, d)
        pos = torch.arange(T, dtype=torch.float32)
        div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32)
                        * -(math.log(10000.0) / d))
        pe = torch.zeros(T, d)
        pe[:, 0::2] = torch.sin(pos[:, None] * div)
        pe[:, 1::2] = torch.cos(pos[:, None] * div)

        with torch.no_grad():
            x = x0 * math.sqrt(d) + pe[None]
            hx = n1(x)
            q = lq(hx).view(1, T, h, dk).transpose(1, 2)
            k = lk(hx).view(1, T, h, dk).transpose(1, 2)
            v = lv(hx).view(1, T, h, dk).transpose(1, 2)
            scores = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(dk)
            att = torch.matmul(torch.softmax(scores, dim=-1), v)
            y = x + lo(att.transpose(1, 2).reshape(1, T, d))
            y = y + w2(torch.relu(w1(n2(y))))
            ref = y.numpy()

        def j(m):  # torch Linear/LayerNorm -> our param dicts
            sdd = {kk: vv.numpy() for kk, vv in m.state_dict().items()}
            if "weight" in sdd and sdd["weight"].ndim == 2:
                return {"w": jnp.asarray(sdd["weight"].T),
                        "b": jnp.asarray(sdd["bias"])}
            return {"scale": jnp.asarray(sdd["weight"]),
                    "bias": jnp.asarray(sdd["bias"])}

        bp = {"ln1": j(n1), "q": j(lq), "k": j(lk), "v": j(lv), "o": j(lo),
              "ln2": j(n2), "ffn1": j(w1), "ffn2": j(w2)}
        xj = jnp.asarray(x0.numpy()) * math.sqrt(d)
        xj = xj + sinusoidal_pe(jnp.arange(T), d)[None]
        hj = layer_norm(bp["ln1"], xj)
        kj = linear(bp["k"], hj).reshape(1, T, 2, dk)
        vj = linear(bp["v"], hj).reshape(1, T, 2, dk)
        att = enc._rel_attention(bp, hj, kj, vj,
                                 jnp.zeros((T, d)), None, cfg)
        yj = xj + att
        yj = yj + enc._ffn(bp, layer_norm(bp["ln2"], yj), cfg)[0]
        np.testing.assert_allclose(np.asarray(yj), ref, rtol=2e-4, atol=2e-4)


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
