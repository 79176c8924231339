import jax
import jax.numpy as jnp
import numpy as np

from freeze_omni_tpu.config import LLMConfig
from freeze_omni_tpu.models import qwen2
from freeze_omni_tpu.ops.quant import (quantize_linear, quantize_llm_params,
                                       quantized_bytes)


class TestQuant:
    def test_quantize_linear_roundtrip(self):
        rng = np.random.RandomState(0)
        p = {"w": jnp.asarray(rng.randn(64, 32), jnp.float32)}
        q = quantize_linear(p)
        assert q["w_q"].dtype == jnp.int8 and q["scale"].shape == (32,)
        deq = q["w_q"].astype(jnp.float32) * q["scale"][None, :]
        rel = np.abs(np.asarray(deq - p["w"])).max() / np.abs(np.asarray(p["w"])).max()
        assert rel < 0.01  # <1% of max weight per channel

    def test_stacked_layer_quantization(self):
        rng = np.random.RandomState(1)
        p = {"w": jnp.asarray(rng.randn(3, 16, 8), jnp.float32)}
        q = quantize_linear(p)
        assert q["w_q"].shape == (3, 16, 8) and q["scale"].shape == (3, 8)

    def test_llm_forward_with_quantized_weights(self):
        cfg = LLMConfig(hidden=64, num_layers=2, num_heads=4, num_kv_heads=2,
                        ffn=128, vocab_size=100, max_kv_len=32)
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = quantize_llm_params(params)

        ids = jnp.asarray([[3, 14, 15, 9, 2]])
        embeds = qwen2.embed_tokens(params, ids)
        cache = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        h_ref, _ = qwen2.forward(params, cfg, embeds, jnp.ones((1, 5), bool), cache)
        cache2 = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        h_q, _ = qwen2.forward(qparams, cfg, embeds, jnp.ones((1, 5), bool), cache2)

        ref = np.asarray(h_ref)
        got = np.asarray(h_q)
        # int8 weight-only: small relative error on hidden states
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        assert rel < 0.05, rel

        # memory: quantized layer stack ~halved
        b_ref = quantized_bytes(params["layers"])
        b_q = quantized_bytes(qparams["layers"])
        assert b_q < 0.6 * b_ref

    def test_serving_engine_with_quantized_llm(self):
        """Regression (r2): the serving path with an int8 tree + bf16
        activations must keep the layer-scan carry dtype stable — the f32
        quantization scales / biases / KV cache must not upcast bf16
        activations (role_kv once picked its KV dtype from the first tree
        leaf, an f32 scale, breaking full-depth int8 serving)."""
        import jax.numpy as jnp

        from freeze_omni_tpu.config import tiny_system
        from freeze_omni_tpu.models import audio_llm
        from freeze_omni_tpu.runtime.engine import ServingEngine

        cfg = tiny_system()
        params = audio_llm.init_params(jax.random.PRNGKey(0), cfg.audio_llm,
                                       llm_dtype=jnp.bfloat16,
                                       quantize_llm=True)
        eng = ServingEngine(cfg, params=params, seed=0,
                            kv_dtype=jnp.bfloat16)
        eng.open_session("s0")
        eng.submit_chunk("s0", "user",
                         np.zeros((1, 32, 80), np.float32), is_sl=True)
        out = eng.tick()
        pred = out["user"][eng.store.slot_of("s0")]
        assert 0.0 <= pred["state_1"] <= 1.0

    def test_int4_pack_roundtrip(self):
        from freeze_omni_tpu.ops.quant import (dequantize_weight_int4,
                                               quantize_linear_int4)

        w = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 64)) * 0.1
        q = quantize_linear_int4({"w": w, "b": jnp.zeros((2, 64))}, group=128)
        assert q["w_q4"].shape == (2, 128, 64) and q["w_q4"].dtype == jnp.uint8
        assert q["scale4"].shape == (2, 2, 64)  # 256/128 groups
        deq = dequantize_weight_int4(q, dtype=jnp.float32)
        assert deq.shape == (2, 256, 64)
        # 4-bit symmetric: max error <= scale/2 per group
        err = np.abs(np.asarray(deq) - np.asarray(w))
        bound = np.asarray(q["scale4"])[:, :, None, :].repeat(128, 2).reshape(
            2, 256, 64) * 0.5 + 1e-7
        assert (err <= bound).all()

    def test_int4_linear_dispatch_matches_dequant(self):
        from freeze_omni_tpu.models.layers import linear
        from freeze_omni_tpu.ops.quant import (dequantize_weight_int4,
                                               quantize_linear_int4)

        w = jax.random.normal(jax.random.PRNGKey(1), (256, 32)) * 0.05
        b = jax.random.normal(jax.random.PRNGKey(2), (32,)) * 0.01
        q = quantize_linear_int4({"w": w, "b": b})
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 256)).astype(
            jnp.float32)
        got = linear(q, x)
        want = x @ dequantize_weight_int4(q, jnp.float32) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_llm_forward_with_int4_weights(self):
        """Grouped int4: forward stays close to full precision and the layer
        stack shrinks ~2x below int8."""
        from freeze_omni_tpu.ops.quant import (quantize_llm_params,
                                               quantized_bytes)
        import freeze_omni_tpu.ops.quant as quant_mod
        from freeze_omni_tpu.config import LLMConfig
        from freeze_omni_tpu.models import qwen2

        cfg = LLMConfig(hidden=256, num_layers=2, num_heads=4, num_kv_heads=2,
                        ffn=512, vocab_size=128, max_kv_len=64)
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
        # int4-quantize the projections via the same grouped path the init
        # uses (group must divide the smallest K=256)
        q4 = dict(params)
        layers = dict(params["layers"])
        for name in ("q", "k", "v", "o", "gate", "up", "down"):
            layers[name] = quant_mod.quantize_linear_int4(layers[name],
                                                          group=128)
        q4["layers"] = layers

        ids = jnp.asarray([[3, 14, 15, 9, 2]])
        embeds = qwen2.embed_tokens(params, ids)
        cache = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        h_ref, _ = qwen2.forward(params, cfg, embeds,
                                 jnp.ones((1, 5), bool), cache)
        cache2 = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        h_q, _ = qwen2.forward(q4, cfg, embeds,
                               jnp.ones((1, 5), bool), cache2)
        rel = np.abs(np.asarray(h_q) - np.asarray(h_ref)).max() / \
            (np.abs(np.asarray(h_ref)).max() + 1e-6)
        assert rel < 0.15, rel  # 4-bit grouped: coarser than int8 but sane

        b8 = quantized_bytes(quantize_llm_params(params)["layers"])
        b4 = quantized_bytes(q4["layers"])
        assert b4 < 0.62 * b8

    def test_pallas_int4_matmul_matches_dequant(self):
        """quant_matmul4 (interpret mode): packed-int4 kernel == XLA dequant
        reference, including multi-group scales and row padding."""
        from freeze_omni_tpu.ops.quant import (dequantize_weight_int4,
                                               quantize_linear_int4)
        from freeze_omni_tpu.ops.quant_matmul import quant_matmul4

        K, O = 256, 128
        w = jax.random.normal(jax.random.PRNGKey(0), (K, O)) * 0.1
        q = quantize_linear_int4({"w": w}, group=128)  # 2 scale groups
        x = jax.random.normal(jax.random.PRNGKey(1), (3, K))
        want = x @ dequantize_weight_int4(q, jnp.float32)
        got = quant_matmul4(x, q["w_q4"], q["scale4"], group=128,
                            block_o=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
