import jax
import jax.numpy as jnp
import numpy as np

from freeze_omni_tpu.config import LLMConfig
from freeze_omni_tpu.models import qwen2


def _cfg():
    return LLMConfig(hidden=64, num_layers=2, num_heads=4, num_kv_heads=2,
                     ffn=128, vocab_size=100, max_kv_len=64)


def _params(cfg, seed=0):
    return qwen2.init_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)


class TestQwen2:
    def test_chunked_padded_prefill_matches_full(self):
        """Feeding ragged chunks (padded to a static length, compacted into the
        cache) must reproduce the one-shot causal forward."""
        cfg = _cfg()
        params = _params(cfg)
        rng = np.random.RandomState(0)
        n = 9
        embeds = jnp.asarray(rng.randn(1, n, cfg.hidden), jnp.float32)

        # one-shot forward
        cache = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        full_h, full_cache = qwen2.forward(params, cfg, embeds,
                                           jnp.ones((1, n), bool), cache)

        # chunked: valid lengths 4, 2, 3 padded to static T=5
        cache2 = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        T = 5
        outs = []
        off = 0
        for nv in (4, 2, 3):
            chunk = jnp.zeros((1, T, cfg.hidden), jnp.float32)
            chunk = chunk.at[:, :nv].set(embeds[:, off : off + nv])
            # scatter valid tokens into non-contiguous pad layout to stress masks
            mask = jnp.zeros((1, T), bool).at[:, :nv].set(True)
            h, cache2 = qwen2.forward(params, cfg, chunk, mask, cache2)
            outs.append(np.asarray(h)[:, :nv])
            off += nv

        got = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(got, np.asarray(full_h), rtol=2e-4, atol=2e-4)
        assert int(cache2.length[0]) == n
        np.testing.assert_allclose(np.asarray(cache2.k)[:, :, :n],
                                   np.asarray(full_cache.k)[:, :, :n],
                                   rtol=1e-5, atol=1e-5)

    def test_holey_mask_compaction(self):
        """Valid tokens interleaved with padding (e.g. optional chat prefix)
        compact identically to a contiguous layout."""
        cfg = _cfg()
        params = _params(cfg)
        rng = np.random.RandomState(1)
        toks = jnp.asarray(rng.randn(1, 3, cfg.hidden), jnp.float32)

        cache_a = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        pad = jnp.zeros((1, 6, cfg.hidden), jnp.float32)
        holey = pad.at[:, jnp.array([1, 3, 4])].set(toks)
        mask = jnp.zeros((1, 6), bool).at[:, jnp.array([1, 3, 4])].set(True)
        h_a, cache_a = qwen2.forward(params, cfg, holey, mask, cache_a)

        cache_b = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        h_b, cache_b = qwen2.forward(params, cfg, toks, jnp.ones((1, 3), bool), cache_b)

        got = np.asarray(h_a)[0, [1, 3, 4]]
        np.testing.assert_allclose(got, np.asarray(h_b)[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cache_a.k)[:, :, :3],
                                   np.asarray(cache_b.k)[:, :, :3], rtol=1e-5, atol=1e-5)

    def test_batched_sessions_independent_lengths(self):
        cfg = _cfg()
        params = _params(cfg)
        rng = np.random.RandomState(2)
        e = jnp.asarray(rng.randn(2, 4, cfg.hidden), jnp.float32)
        mask = jnp.array([[True] * 4, [True, True, False, False]])
        cache = qwen2.init_cache(cfg, 2, dtype=jnp.float32)
        h, cache = qwen2.forward(params, cfg, e, mask, cache)
        assert list(np.asarray(cache.length)) == [4, 2]

        # session 1's result must equal a solo run of its 2 tokens
        cache_solo = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        h_solo, _ = qwen2.forward(params, cfg, e[1:2, :2],
                                  jnp.ones((1, 2), bool), cache_solo)
        np.testing.assert_allclose(np.asarray(h)[1, :2], np.asarray(h_solo)[0],
                                   rtol=2e-4, atol=2e-4)

    def test_decode_step_and_logits(self):
        cfg = _cfg()
        params = _params(cfg)
        ids = jnp.array([[5, 17, 3]])
        embeds = qwen2.embed_tokens(params, ids)
        cache = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        h, cache = qwen2.forward(params, cfg, embeds, jnp.ones((1, 3), bool), cache)
        lg = qwen2.logits(params, cfg, h[:, -1])
        assert lg.shape == (1, 100)
        # decode one token
        nxt = qwen2.embed_tokens(params, jnp.array([[7]]))
        h2, cache = qwen2.forward(params, cfg, nxt, jnp.ones((1, 1), bool), cache)
        assert int(cache.length[0]) == 4

        # equals one-shot on the 4 tokens
        cache_f = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        e4 = qwen2.embed_tokens(params, jnp.array([[5, 17, 3, 7]]))
        h_f, _ = qwen2.forward(params, cfg, e4, jnp.ones((1, 4), bool), cache_f)
        np.testing.assert_allclose(np.asarray(h2)[0, 0], np.asarray(h_f)[0, -1],
                                   rtol=2e-4, atol=2e-4)

    def test_last_valid_index(self):
        m = jnp.array([[True, True, False], [True, False, False]])
        np.testing.assert_array_equal(np.asarray(qwen2.last_valid_index(m)), [1, 0])


class TestRollKV:
    """Sliding-window KV with pinned role prefix (replaces hard context
    reset). roll_kv keeps the ORIGINAL contextual K/V of the window and
    re-rotates moved K entries to within-cache positions (StreamingLLM
    eviction semantics): for a 1-layer model K/V are context-free, so the
    rolled cache must equal a fresh prefill of [prefix, window] exactly."""

    def _cfg(self, layers=2):
        from freeze_omni_tpu.config import LLMConfig
        return LLMConfig(hidden=64, num_layers=layers, num_heads=4,
                         num_kv_heads=2, ffn=128, vocab_size=97, max_kv_len=48)

    def test_roll_matches_fresh_prefill_single_layer(self):
        cfg = self._cfg(layers=1)
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
        P, N, W = 5, 30, 12
        rng = np.random.RandomState(0)
        role = jnp.asarray(rng.randint(0, 97, (1, P)))
        convo = jnp.asarray(rng.randint(0, 97, (1, N)))

        def prefill(ids, kv):
            emb = qwen2.embed_tokens(params, ids)
            _, kv = qwen2.forward(params, cfg, emb,
                                  jnp.ones(ids.shape, bool), kv)
            return kv

        kv = prefill(role, qwen2.init_cache(cfg, 1, dtype=jnp.float32))
        kv = prefill(convo, kv)
        rolled = qwen2.roll_kv(cfg, kv, jnp.asarray([P]), W,
                               jnp.asarray([True]))
        assert int(rolled.length[0]) == P + W

        fresh = prefill(role, qwen2.init_cache(cfg, 1, dtype=jnp.float32))
        fresh = prefill(convo[:, -W:], fresh)
        np.testing.assert_allclose(np.asarray(rolled.k[:, :, : P + W]),
                                   np.asarray(fresh.k[:, :, : P + W]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rolled.v[:, :, : P + W]),
                                   np.asarray(fresh.v[:, :, : P + W]),
                                   rtol=1e-4, atol=1e-5)

        # next-step hidden identical: the roll is invisible to the model
        nxt = jnp.asarray(rng.randint(0, 97, (1, 1)))
        emb = qwen2.embed_tokens(params, nxt)
        h_roll, _ = qwen2.forward(params, cfg, emb, jnp.ones((1, 1), bool),
                                  rolled)
        h_fresh, _ = qwen2.forward(params, cfg, emb, jnp.ones((1, 1), bool),
                                   fresh)
        np.testing.assert_allclose(np.asarray(h_roll), np.asarray(h_fresh),
                                   rtol=1e-4, atol=1e-5)

    def test_roll_preserves_contextual_values_deep(self):
        """Deep layers keep their full-history contextual V (the reason the
        roll is better than a reset): window V rows move verbatim."""
        cfg = self._cfg(layers=2)
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
        rng = np.random.RandomState(2)
        ids = jnp.asarray(rng.randint(0, 97, (1, 25)))
        emb = qwen2.embed_tokens(params, ids)
        kv = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        _, kv = qwen2.forward(params, cfg, emb, jnp.ones((1, 25), bool), kv)
        P, W = 4, 10
        rolled = qwen2.roll_kv(cfg, kv, jnp.asarray([P]), W,
                               jnp.asarray([True]))
        np.testing.assert_array_equal(
            np.asarray(rolled.v[:, :, P : P + W]),
            np.asarray(kv.v[:, :, 25 - W : 25]))
        np.testing.assert_array_equal(np.asarray(rolled.v[:, :, :P]),
                                      np.asarray(kv.v[:, :, :P]))

    def test_roll_is_per_row_gated(self):
        cfg = self._cfg()
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
        rng = np.random.RandomState(1)
        ids = jnp.asarray(rng.randint(0, 97, (2, 20)))
        emb = qwen2.embed_tokens(params, ids)
        kv = qwen2.init_cache(cfg, 2, dtype=jnp.float32)
        _, kv = qwen2.forward(params, cfg, emb, jnp.ones((2, 20), bool), kv)
        rolled = qwen2.roll_kv(cfg, kv, jnp.asarray([4, 4]), 8,
                               jnp.asarray([True, False]))
        assert int(rolled.length[0]) == 12 and int(rolled.length[1]) == 20
        np.testing.assert_array_equal(np.asarray(rolled.k[:, 1]),
                                      np.asarray(kv.k[:, 1]))
