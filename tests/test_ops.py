import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.ops.attention import (decode_attention,
                                           decode_attention_blocked,
                                           decode_attention_reference,
                                           gqa_decode)
from freeze_omni_tpu.ops.sampling import (apply_repetition_penalty,
                                          sample_top_k, sample_top_k_top_p)


class TestDecodeAttention:
    @pytest.mark.parametrize("B,H,Hkv,dk,S", [
        (4, 8, 2, 128, 256),
        (2, 28, 4, 128, 512),
        (1, 4, 4, 128, 128),   # no GQA grouping
    ])
    def test_pallas_matches_reference(self, B, H, Hkv, dk, S):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, dk), jnp.float32)
        k = jnp.asarray(rng.randn(B, S, Hkv, dk), jnp.float32)
        v = jnp.asarray(rng.randn(B, S, Hkv, dk), jnp.float32)
        length = jnp.asarray(rng.randint(1, S + 1, (B,)), jnp.int32)
        ref = decode_attention_reference(q, k, v, length)
        out = decode_attention(q, k, v, length, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_length_masking_is_exact(self):
        """Slots beyond `length` must have zero influence."""
        rng = np.random.RandomState(1)
        B, H, Hkv, dk, S = 1, 4, 2, 128, 64
        q = jnp.asarray(rng.randn(B, H, dk), jnp.float32)
        k = jnp.asarray(rng.randn(B, S, Hkv, dk), jnp.float32)
        v = jnp.asarray(rng.randn(B, S, Hkv, dk), jnp.float32)
        L = 10
        out1 = decode_attention(q, k, v, jnp.asarray([L]), interpret=True)
        k2 = k.at[:, L:].set(1e6)
        v2 = v.at[:, L:].set(-1e6)
        out2 = decode_attention(q, k2, v2, jnp.asarray([L]), interpret=True)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-6, atol=1e-6)

    def test_blocked_flash_variant_matches_reference(self):
        """Double-buffered HBM-DMA flash-decode over only ceil(len/block)
        blocks must match the full-read reference at ragged lengths."""
        rng = np.random.RandomState(3)
        B, H, Hkv, dk, S = 3, 8, 2, 128, 1024
        q = jnp.asarray(rng.randn(B, H, dk), jnp.float32)
        k = jnp.asarray(rng.randn(B, S, Hkv, dk), jnp.float32)
        v = jnp.asarray(rng.randn(B, S, Hkv, dk), jnp.float32)
        length = jnp.asarray([5, 300, 1024], jnp.int32)
        ref = decode_attention_reference(q, k, v, length)
        out = decode_attention_blocked(q, k, v, length, block=256,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_dispatch_fallback(self):
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(1, 4, 128), jnp.float32)
        k = jnp.asarray(rng.randn(1, 32, 2, 128), jnp.float32)
        v = jnp.asarray(rng.randn(1, 32, 2, 128), jnp.float32)
        out = gqa_decode(q, k, v, jnp.asarray([16]), use_pallas=False)
        assert out.shape == (1, 4, 128)


class TestSampling:
    def test_top_k_support(self):
        logits = jnp.asarray([[0.0, 5.0, 4.0, -1.0, 3.0]])
        for seed in range(20):
            t = sample_top_k(jax.random.PRNGKey(seed), logits, top_k=2)
            assert int(t[0]) in (1, 2)

    def test_top_p_keeps_argmax(self):
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        t = sample_top_k_top_p(jax.random.PRNGKey(0), logits, temperature=0.7,
                               top_k=3, top_p=0.1)
        assert int(t[0]) == 0

    def test_temperature_flattens(self):
        logits = jnp.asarray([[2.0, 0.0]])
        hot = [int(sample_top_k_top_p(jax.random.PRNGKey(s), logits,
                                      temperature=10.0, top_k=2, top_p=0.0)[0])
               for s in range(200)]
        cold = [int(sample_top_k_top_p(jax.random.PRNGKey(s), logits,
                                       temperature=0.05, top_k=2, top_p=0.0)[0])
                for s in range(200)]
        assert sum(cold) < sum(hot)  # cold sampling picks index 0 ~always

    def test_repetition_penalty(self):
        logits = jnp.asarray([[2.0, 2.0, -2.0, 2.0]])
        window = jnp.asarray([[1, 2, 99]])  # 99 out of range -> one-hot zero row
        out = apply_repetition_penalty(logits, window, penalty=2.0)
        np.testing.assert_allclose(np.asarray(out)[0], [2.0, 1.0, -1.0, 2.0])
