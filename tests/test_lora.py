"""LoRA adapters on the frozen LLM (models/lora.py).

The reference's LoRA block is dead code (models/audioLLM.py:150-157: gated on
`use_lora` over undefined names); these tests pin the behavior of our working
version: zero-init no-op, applied==merged parity (dense AND quantized trees),
a training stage that actually learns, and the save/load + CLI round trip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.config import LLMConfig
from freeze_omni_tpu.models import lora as lora_mod
from freeze_omni_tpu.models import qwen2

CFG = LLMConfig(hidden=64, num_layers=2, num_heads=4, num_kv_heads=2,
                ffn=96, vocab_size=64, max_kv_len=32)


def _params(seed=0):
    return qwen2.init_params(jax.random.PRNGKey(seed), CFG, dtype=jnp.float32)


def _fwd(params, emb, lora=None, scale=1.0):
    B, T, _ = emb.shape
    cache = qwen2.init_cache(CFG, B, max_len=T + 1, dtype=jnp.float32)
    hidden, kv = qwen2.forward(params, CFG, emb, jnp.ones((B, T), bool),
                               cache, lora=lora, lora_scale=scale)
    return np.asarray(hidden), kv


def _rand_lora(seed=7, rank=4, targets=("q", "v", "down")):
    tree = lora_mod.init(jax.random.PRNGKey(seed), CFG, rank=rank,
                         targets=targets)
    # make B nonzero so the delta is real
    return jax.tree.map(
        lambda t: t + 0.05 * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                               t.shape, t.dtype), tree)


class TestLora:
    def test_zero_init_is_noop(self):
        """B = 0 at init: attaching an untrained adapter changes nothing."""
        params = _params()
        emb = np.random.RandomState(0).randn(2, 5, CFG.hidden).astype(np.float32)
        base, _ = _fwd(params, jnp.asarray(emb))
        tree = lora_mod.init(jax.random.PRNGKey(3), CFG, rank=4)
        with_lora, _ = _fwd(params, jnp.asarray(emb), lora=tree)
        np.testing.assert_array_equal(base, with_lora)

    def test_applied_equals_merged_dense(self):
        """forward(lora=tree) == forward on merge(params, tree) — scan path
        and the KV caches both."""
        params = _params()
        tree = _rand_lora()
        emb = jnp.asarray(
            np.random.RandomState(1).randn(2, 6, CFG.hidden), jnp.float32)
        h_app, kv_app = _fwd(params, emb, lora=tree, scale=1.3)
        merged = lora_mod.merge(params, tree, scale=1.3)
        h_mrg, kv_mrg = _fwd(merged, emb)
        np.testing.assert_allclose(h_app, h_mrg, rtol=0, atol=2e-5)
        np.testing.assert_allclose(np.asarray(kv_app.k), np.asarray(kv_mrg.k),
                                   rtol=0, atol=2e-5)
        # merge must not mutate its input
        assert np.array_equal(np.asarray(params["layers"]["q"]["w"]),
                              np.asarray(_params()["layers"]["q"]["w"]))

    def test_merge_quantized_tree(self):
        """Dequant-merge-requant on an int8 tree tracks the dense merge to
        quantization noise (direction preserved, not bit-exact)."""
        from freeze_omni_tpu.ops.quant import quantize_llm_params

        params = _params()
        tree = _rand_lora()
        emb = jnp.asarray(
            np.random.RandomState(2).randn(1, 4, CFG.hidden), jnp.float32)
        dense, _ = _fwd(lora_mod.merge(params, tree), emb)

        q = quantize_llm_params(params, quantize_embeddings=False)
        q_merged = lora_mod.merge(q, tree)
        assert "w_q" in q_merged["layers"]["q"]  # stays quantized
        h_q, _ = _fwd(q_merged, emb)
        cos = np.sum(dense * h_q) / (np.linalg.norm(dense)
                                     * np.linalg.norm(h_q) + 1e-9)
        assert cos > 0.99, cos

    def test_unknown_target_rejected(self):
        with pytest.raises(ValueError, match="unknown LoRA targets"):
            lora_mod.init(jax.random.PRNGKey(0), CFG, targets=("q", "bogus"))

    def test_save_load_roundtrip(self, tmp_path):
        tree = _rand_lora()
        p = str(tmp_path / "l.npz")
        lora_mod.save(p, jax.device_get(tree), scale=0.7)
        back, scale = lora_mod.load(p)
        assert scale == pytest.approx(0.7)
        for name in tree:
            np.testing.assert_allclose(np.asarray(tree[name]["a"]),
                                       back[name]["a"], atol=0)

    def test_stage_learns_successor_map(self):
        """The lora stage fits the deterministic successor-map fixture:
        next-token CE drops while the base LLM stays bit-frozen."""
        from freeze_omni_tpu.config import (AdapterConfig, AudioLLMConfig,
                                            EncoderConfig)
        from freeze_omni_tpu.training import data as data_mod
        from freeze_omni_tpu.training import train_step as ts

        acfg = AudioLLMConfig(
            encoder=EncoderConfig(input_dim=80, output_dim=32,
                                  attention_dim=32, attention_heads=4,
                                  linear_units=64, num_blocks=2, chunk_size=4,
                                  left_chunks=2, pe_max_len=256),
            adapter=AdapterConfig(enc_out_dim=32, llm_dim=64),
            llm=CFG)
        params = qwen2.init_params(jax.random.PRNGKey(0), CFG,
                                   dtype=jnp.float32)
        frozen = {"llm": params}
        trainable = {"lora": lora_mod.init(
            jax.random.PRNGKey(5), CFG, rank=8,
            targets=("q", "v", "o", "down"))}
        opt = ts.make_optimizer(lr=5e-3)
        state = ts.init_train_state(trainable, opt)
        step = jax.jit(lambda s, b: ts.stage_step(
            "lora", s, frozen, opt, acfg, None, b))
        losses = []
        for i in range(30):
            b = data_mod.synth_lora_batch(i % 4, acfg, batch=8)
            state, m = step(state, {k: jnp.asarray(v) for k, v in b.items()})
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
        # base weights bit-identical; adapter B actually moved
        np.testing.assert_array_equal(
            np.asarray(frozen["llm"]["layers"]["q"]["w"]),
            np.asarray(params["layers"]["q"]["w"]))
        assert float(jnp.abs(state.trainable["lora"]["q"]["b"]).max()) > 0

    def test_train_cli_writes_adapter(self, tmp_path):
        """bin/train.py --stage lora runs end-to-end and writes lora.npz."""
        from freeze_omni_tpu.bin.train import main as train_main

        ckpt = str(tmp_path / "ck")
        os.makedirs(ckpt, exist_ok=True)
        train_main(["--preset", "tiny", "--stage", "lora", "--steps", "4",
                    "--batch", "2", "--ckpt_dir", ckpt, "--lora_rank", "4"])
        tree, scale = lora_mod.load(os.path.join(ckpt, "lora.npz"))
        assert set(tree) == {"q", "v"} and scale == 1.0
