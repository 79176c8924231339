import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.config import LLMConfig
from freeze_omni_tpu.models import qwen2
from freeze_omni_tpu.parallel.mesh import make_mesh
from freeze_omni_tpu.parallel.ring_attention import sp_forward


class TestRingAttentionSP:
    @pytest.mark.parametrize("ring", [2, 4, 8])
    def test_sequence_parallel_matches_unsharded(self, ring):
        cfg = LLMConfig(hidden=64, num_layers=2, num_heads=4, num_kv_heads=2,
                        ffn=128, vocab_size=64, max_kv_len=64)
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        B, T = 2, 16
        embeds = jnp.asarray(
            np.random.RandomState(0).randn(B, T, cfg.hidden), jnp.float32)

        cache = qwen2.init_cache(cfg, B, dtype=jnp.float32)
        ref, _ = qwen2.forward(params, cfg, embeds, jnp.ones((B, T), bool), cache)

        mesh = make_mesh((ring,), ("seq",))
        out = sp_forward(params, cfg, embeds, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)

    def test_composes_with_data_axis(self):
        cfg = LLMConfig(hidden=64, num_layers=2, num_heads=4, num_kv_heads=2,
                        ffn=128, vocab_size=64, max_kv_len=64)
        params = qwen2.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
        B, T = 2, 8
        embeds = jnp.asarray(
            np.random.RandomState(1).randn(B, T, cfg.hidden), jnp.float32)
        mesh = make_mesh((2, 4), ("data", "seq"))
        out = sp_forward(params, cfg, embeds, mesh)
        cache = qwen2.init_cache(cfg, B, dtype=jnp.float32)
        ref, _ = qwen2.forward(params, cfg, embeds, jnp.ones((B, T), bool), cache)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)
