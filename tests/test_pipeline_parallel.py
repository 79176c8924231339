import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.config import LLMConfig
from freeze_omni_tpu.models import qwen2
from freeze_omni_tpu.parallel.mesh import make_mesh
from freeze_omni_tpu.parallel.pipeline_parallel import pp_forward


class TestPipelineParallel:
    @pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 4), (4, 2)])
    def test_gpipe_matches_unsharded_forward(self, stages, microbatches):
        cfg = LLMConfig(hidden=64, num_layers=4, num_heads=4, num_kv_heads=2,
                        ffn=128, vocab_size=64, max_kv_len=32)
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        B, T = 4, 6
        embeds = jnp.asarray(
            np.random.RandomState(0).randn(B, T, cfg.hidden), jnp.float32)

        cache = qwen2.init_cache(cfg, B, dtype=jnp.float32)
        ref, _ = qwen2.forward(params, cfg, embeds, jnp.ones((B, T), bool), cache)

        mesh = make_mesh((stages,), ("stage",))
        out = pp_forward(params, cfg, embeds, mesh, num_microbatches=microbatches)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_composes_with_data_axis(self):
        """('data', 'stage') mesh: PP over stages while DP shards nothing here
        but the mesh shape must not break the schedule."""
        cfg = LLMConfig(hidden=64, num_layers=4, num_heads=4, num_kv_heads=2,
                        ffn=128, vocab_size=64, max_kv_len=32)
        params = qwen2.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
        B, T = 2, 5
        embeds = jnp.asarray(
            np.random.RandomState(1).randn(B, T, cfg.hidden), jnp.float32)
        mesh = make_mesh((2, 4), ("data", "stage"))
        out = pp_forward(params, cfg, embeds, mesh, num_microbatches=2)
        cache = qwen2.init_cache(cfg, B, dtype=jnp.float32)
        ref, _ = qwen2.forward(params, cfg, embeds, jnp.ones((B, T), bool), cache)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
