"""Full-flagship-dims conversion + forward golden parity (VERDICT r2 #1).

Real Freeze-Omni weights are external (HF VITA-MLLM/Freeze-Omni +
Qwen/Qwen2-7B-Instruct, reference README.md:84-86) and absent from this box,
so these tests build torch/HF modules at the REAL shapes — Qwen2-7B
28L/3584-hidden/28q+4kv-heads/18944-ffn/152064-vocab
(models/audioLLM.py:70-74), the 16-block 512-dim encoder + 512->3584 adapter
(models/utils.py:11-28 checkpoint family), the 4L/896 AR speech decoder and
the full TiCodec generator (models/decoder/llm2tts.py:33-67) — with random
weights on CPU, run the utils/checkpoint.py converters on their state dicts,
and golden-compare our forwards against torch.

These are the shapes where layout/indexing bugs invisible at toy dims live:
the GQA 28q/4kv head interleave, the 18944 ffn partitioning, the
vocab-parallel embedding, the 9728-column subsampling flatten. A
quantize-on-convert int8 round trip is included. All tests are slow-marked
(the 7B torch build alone is ~30 GB / minutes on CPU).
"""

import gc
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freeze_omni_tpu.config import (AdapterConfig, EncoderConfig, LLMConfig,
                                    SpeechDecoderConfig)
from freeze_omni_tpu.utils import checkpoint as ckpt

pytestmark = pytest.mark.slow


def _rel_err(got, ref):
    got, ref = np.asarray(got, np.float64), np.asarray(ref, np.float64)
    return float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9))


class TestQwen2FullDims:
    """The frozen backbone at the exact Qwen2-7B-Instruct geometry."""

    CFG = LLMConfig(hidden=3584, num_layers=28, num_heads=28, num_kv_heads=4,
                    ffn=18944, vocab_size=152064, rope_theta=1e6,
                    rms_eps=1e-6, max_kv_len=64)

    def test_prefill_decode_and_int8_roundtrip(self):
        from transformers import Qwen2Config, Qwen2ForCausalLM

        from freeze_omni_tpu.models import qwen2
        from freeze_omni_tpu.ops.quant import quantize_llm_params

        cfg = self.CFG
        hf_cfg = Qwen2Config(
            hidden_size=cfg.hidden, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.num_kv_heads,
            intermediate_size=cfg.ffn, vocab_size=cfg.vocab_size,
            rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_eps,
            tie_word_embeddings=False, attention_dropout=0.0)
        torch.manual_seed(0)
        hf = Qwen2ForCausalLM(hf_cfg).eval()

        # golden: a 24-token prefill (one chat prefix + 224ms-chunk worth of
        # embeddings is ~9-29 tokens in serving) and one cached decode step
        rng = np.random.RandomState(1)
        ids = rng.randint(0, cfg.vocab_size, (1, 24))
        next_id = int(rng.randint(0, cfg.vocab_size))
        with torch.no_grad():
            out = hf(input_ids=torch.tensor(ids), output_hidden_states=True,
                     use_cache=True)
            step = hf(input_ids=torch.tensor([[next_id]]),
                      past_key_values=out.past_key_values)
        ref_hidden = out.hidden_states[-1].numpy().copy()
        ref_logits_last = out.logits.numpy()[:, -1].copy()
        ref_step_logits = step.logits.numpy()[:, -1].copy()
        del out, step

        params = ckpt.convert_hf_qwen2(hf.state_dict(), cfg)
        # _stack copied the layers; embed/lm_head are views into torch
        # storage — materialize them so the 30 GB torch module can be freed
        params["embed"]["w"] = np.ascontiguousarray(params["embed"]["w"])
        params["lm_head"]["w"] = np.ascontiguousarray(params["lm_head"]["w"])
        del hf
        gc.collect()
        params = jax.tree.map(jnp.asarray, params)
        gc.collect()

        cache = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
        hidden, cache = qwen2.forward(params, cfg, embeds,
                                      jnp.ones((1, 24), bool), cache)
        logits = qwen2.logits(params, cfg, hidden[:, -1])
        err_h = _rel_err(hidden, ref_hidden)
        err_l = _rel_err(logits, ref_logits_last)
        assert err_h < 2e-3, f"prefill hidden rel err {err_h}"
        assert err_l < 2e-3, f"prefill logits rel err {err_l}"

        # incremental decode against the HF cache step (RoPE offset, GQA
        # repeat, cache append at full head geometry)
        e1 = qwen2.embed_tokens(params, jnp.asarray([[next_id]]))
        h1, cache = qwen2.forward(params, cfg, e1, jnp.ones((1, 1), bool),
                                  cache)
        step_logits = qwen2.logits(params, cfg, h1[:, 0])
        err_d = _rel_err(step_logits, ref_step_logits)
        assert err_d < 2e-3, f"decode logits rel err {err_d}"
        del cache, hidden, logits, h1, step_logits
        gc.collect()

        # quantize-on-convert int8 round trip at full dims: the converted
        # tree quantizes group-by-group and still reproduces the forward
        qparams = quantize_llm_params(params)
        assert qparams["layers"]["down"]["w_q"].shape == (28, 18944, 3584)
        assert qparams["layers"]["q"]["scale"].shape == (28, 3584)
        del params
        gc.collect()
        qcache = qwen2.init_cache(cfg, 1, dtype=jnp.float32)
        q_embeds = qwen2.embed_tokens(qparams, jnp.asarray(ids))
        # per-row int8 embedding: small relative error on the inputs
        assert _rel_err(q_embeds, np.asarray(embeds)) < 2e-2
        q_hidden, _ = qwen2.forward(qparams, cfg, embeds,
                                    jnp.ones((1, 24), bool), qcache)
        # RANDOM 28-layer weights amplify per-channel int8 noise layer over
        # layer (max-rel ~0.15 measured; trained weights quantize far
        # better), so the discriminating check is directional: a GQA/ffn
        # layout or indexing bug destroys cosine similarity (~0), noise
        # does not (~1). Bound max-rel loosely as a sanity rail.
        a = np.asarray(q_hidden, np.float64).ravel()
        b = np.asarray(ref_hidden, np.float64).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        err_q = _rel_err(q_hidden, ref_hidden)
        assert cos > 0.99, f"int8 hidden cosine {cos}"
        assert err_q < 0.3, f"int8 hidden rel err {err_q}"


class TestEncoderAdapterFullDims:
    """The 16-block 512-dim encoder + 512->3584 adapter + state head, against
    an independently-written torch replica of the reference math
    (models/encoder/transformer.py:236-285, attention.py:268-459,
    adapter.py:72-157, audioLLM.py:214-217)."""

    ECFG = EncoderConfig(input_dim=80, output_dim=512, attention_dim=512,
                         attention_heads=8, linear_units=2048, num_blocks=16,
                         chunk_size=4, left_chunks=16, pe_max_len=5000)
    ACFG = AdapterConfig(enc_out_dim=512, llm_dim=3584, kernel_size=5)

    def _torch_encoder(self, seed=7):
        cfg = self.ECFG
        d, h = cfg.attention_dim, cfg.attention_heads
        torch.manual_seed(seed)
        f_sub = ((cfg.input_dim - 1) // 2 - 1) // 2  # 19
        mods = {
            "conv1": torch.nn.Conv2d(1, d, 3, 2),
            "conv2": torch.nn.Conv2d(d, d, 3, 2),
            "sub_out": torch.nn.Linear(d * f_sub, d),
            "emb_lin": torch.nn.Linear(d, d),
            "emb_ln": torch.nn.LayerNorm(d),
            "after_norm": torch.nn.LayerNorm(d),
        }
        blocks = []
        for _ in range(cfg.num_blocks):
            blk = {
                "n1": torch.nn.LayerNorm(d), "n2": torch.nn.LayerNorm(d),
                "q": torch.nn.Linear(d, d), "k": torch.nn.Linear(d, d),
                "v": torch.nn.Linear(d, d), "o": torch.nn.Linear(d, d),
                "pos": torch.nn.Linear(d, d, bias=False),
                "w1": torch.nn.Linear(d, cfg.linear_units),
                "w2": torch.nn.Linear(cfg.linear_units, d),
                "bu": torch.randn(h, d // h) * 0.05,
                "bv": torch.randn(h, d // h) * 0.05,
            }
            blocks.append(blk)
        return mods, blocks

    def _torch_forward(self, mods, blocks, x_np, mean, istd, mask_np):
        cfg = self.ECFG
        d, h = cfg.attention_dim, cfg.attention_heads
        dk = d // h
        with torch.no_grad():
            x = torch.tensor((x_np - mean) * istd)
            x = x[:, None]  # [B,1,T,F]
            x = torch.relu(mods["conv1"](x))
            x = torch.relu(mods["conv2"](x))
            b, c, t, f = x.shape
            x = mods["sub_out"](x.transpose(1, 2).reshape(b, t, c * f))
            x = torch.relu(mods["emb_ln"](mods["emb_lin"](x)))
            x = x * math.sqrt(d)
            T = x.shape[1]
            pos = torch.arange(T, dtype=torch.float32)
            div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32)
                            * -(math.log(10000.0) / d))
            pe = torch.zeros(T, d)
            pe[:, 0::2] = torch.sin(pos[:, None] * div)
            pe[:, 1::2] = torch.cos(pos[:, None] * div)
            mask = torch.tensor(mask_np)[None, None]  # [1,1,T,T]
            for blk in blocks:
                hx = blk["n1"](x)
                q = blk["q"](hx).view(b, T, h, dk)
                k = blk["k"](hx).view(b, T, h, dk).transpose(1, 2)
                v = blk["v"](hx).view(b, T, h, dk).transpose(1, 2)
                p = blk["pos"](pe).view(T, h, dk).transpose(0, 1)
                ac = torch.matmul((q + blk["bu"]).transpose(1, 2),
                                  k.transpose(-2, -1))
                bd = torch.matmul((q + blk["bv"]).transpose(1, 2),
                                  p.transpose(-2, -1)[None])
                scores = (ac + bd) / math.sqrt(dk)
                scores = scores.masked_fill(~mask, -1e30)
                att = torch.matmul(torch.softmax(scores, dim=-1), v)
                x = x + blk["o"](att.transpose(1, 2).reshape(b, T, d))
                x = x + blk["w2"](torch.relu(blk["w1"](blk["n2"](x))))
            return mods["after_norm"](x).numpy()

    def _state_dict(self, mods, blocks, mean, istd, prefix="encoder_user."):
        sd = {f"{prefix}global_cmvn.mean": torch.tensor(mean),
              f"{prefix}global_cmvn.istd": torch.tensor(istd)}
        named = [(mods["conv1"], f"{prefix}enc.0.core.conv.0"),
                 (mods["conv2"], f"{prefix}enc.0.core.conv.2"),
                 (mods["sub_out"], f"{prefix}enc.0.core.out.0"),
                 (mods["emb_lin"], f"{prefix}enc.1.embed.0"),
                 (mods["emb_ln"], f"{prefix}enc.1.embed.1"),
                 (mods["after_norm"], f"{prefix}enc.1.after_norm")]
        for i, blk in enumerate(blocks):
            b = f"{prefix}enc.1.encoders.{i}"
            named += [(blk["q"], f"{b}.self_attn.linear_q"),
                      (blk["k"], f"{b}.self_attn.linear_k"),
                      (blk["v"], f"{b}.self_attn.linear_v"),
                      (blk["o"], f"{b}.self_attn.linear_out"),
                      (blk["pos"], f"{b}.self_attn.linear_pos"),
                      (blk["n1"], f"{b}.norm1"), (blk["n2"], f"{b}.norm2"),
                      (blk["w1"], f"{b}.feed_forward.w_1"),
                      (blk["w2"], f"{b}.feed_forward.w_2")]
            sd[f"{b}.self_attn.pos_bias_u"] = blk["bu"]
            sd[f"{b}.self_attn.pos_bias_v"] = blk["bv"]
        for mod, name in named:
            for kk, vv in mod.state_dict().items():
                sd[f"{name}.{kk}"] = vv
        return sd

    def test_full_encoder_forward_matches_torch(self):
        import freeze_omni_tpu.models.encoder as enc

        cfg = self.ECFG
        mods, blocks = self._torch_encoder()
        rng = np.random.RandomState(8)
        mean = rng.randn(80).astype(np.float32)
        istd = (0.5 + rng.rand(80)).astype(np.float32)
        x = rng.randn(1, 67, 80).astype(np.float32)  # -> T' = 16 frames

        T_out = ((67 - 1) // 2 - 1) // 2
        mask_np = np.asarray(enc.chunk_causal_mask(
            T_out, cfg.chunk_size, cfg.left_chunks))
        ref = self._torch_forward(mods, blocks, x, mean, istd, mask_np)

        sd = self._state_dict(mods, blocks, mean, istd)
        params = jax.tree.map(
            jnp.asarray, ckpt.convert_encoder(sd, cfg, "encoder_user."))
        out = enc.forward(params, cfg, jnp.asarray(x))
        err = _rel_err(out, ref)
        assert err < 1e-3, f"16-block 512-dim forward rel err {err}"

    def test_full_adapter_and_state_head_match_torch(self):
        from freeze_omni_tpu.models import adapter as adp

        acfg = self.ACFG
        assert acfg.two_stage  # 512*4 < 3584
        torch.manual_seed(9)
        c1 = torch.nn.Conv1d(512, 1024, 5, 1, 0)
        b1 = torch.nn.BatchNorm1d(1024, eps=1e-3, momentum=0.99).eval()
        c2 = torch.nn.Conv1d(1024, 2048, 5, 2, 0)
        b2 = torch.nn.BatchNorm1d(2048, eps=1e-3, momentum=0.99).eval()
        proj = torch.nn.Linear(2048, 3584)
        head = torch.nn.Linear(3584, 4)
        b1.running_mean.normal_(); b1.running_var.uniform_(0.5, 2.0)
        b2.running_mean.normal_(); b2.running_var.uniform_(0.5, 2.0)

        x = torch.randn(1, 16, 512)
        with torch.no_grad():
            hh = torch.nn.functional.pad(x.transpose(1, 2), (4, 0))
            hh = torch.relu(b1(c1(hh)))
            hh = torch.nn.functional.pad(hh, (4, 0))
            hh = torch.relu(b2(c2(hh)))
            emb = proj(hh.transpose(1, 2))
            ref = emb.numpy()
            ref_head = torch.softmax(head(emb[:, -1])[:, :3], dim=-1).numpy()

        sd = {}
        for mod, name in [(c1, "adpter_user.conv1d1"), (b1, "adpter_user.bn1"),
                          (c2, "adpter_user.conv1d2"), (b2, "adpter_user.bn2"),
                          (proj, "adpter_user.project"),
                          (head, "predictor_head")]:
            for kk, vv in mod.state_dict().items():
                sd[f"{name}.{kk}"] = vv
        params = jax.tree.map(
            jnp.asarray, ckpt.convert_adapter(sd, acfg, "adpter_user."))
        out = adp.forward(params, acfg, jnp.asarray(x.numpy()))
        assert _rel_err(out, ref) < 1e-3

        hp = jax.tree.map(jnp.asarray, ckpt._linear(sd, "predictor_head"))
        from freeze_omni_tpu.models.layers import linear

        probs = jax.nn.softmax(linear(hp, out[:, -1])[:, :3], axis=-1)
        np.testing.assert_allclose(np.asarray(probs), ref_head,
                                   rtol=1e-4, atol=1e-4)


class TestSpeechDecoderFullDims:
    """The AR speech decoder at the real 4L/896/14-head/4864-ffn geometry
    (decoder/model.json ckpt cfg), vs transformers LlamaModel."""

    DCFG = SpeechDecoderConfig(idim=896, hidden=896, num_layers=4,
                               num_heads=14, ffn=4864, codec_vocab=1024,
                               rope_theta=10000.0, max_kv_len=128,
                               use_prefix_kv=True)

    def _build(self):
        from transformers import LlamaConfig, LlamaModel

        dcfg = self.DCFG
        lc = LlamaConfig(hidden_size=896, num_hidden_layers=4,
                         num_attention_heads=14, num_key_value_heads=14,
                         intermediate_size=4864, vocab_size=dcfg.full_vocab,
                         rope_theta=10000.0, rms_norm_eps=1e-6,
                         attention_bias=False, mlp_bias=False,
                         attention_dropout=0.0)
        torch.manual_seed(10)
        llama = LlamaModel(lc).eval()
        sd = {k: v for k, v in llama.state_dict().items()
              if k.startswith("layers.") or k == "norm.weight"}
        torch.manual_seed(11)
        pre = LlamaModel(LlamaConfig(
            hidden_size=896, num_hidden_layers=dcfg.num_pre_nn_layers,
            num_attention_heads=14, num_key_value_heads=14,
            intermediate_size=4864, vocab_size=dcfg.full_vocab,
            rope_theta=10000.0, rms_norm_eps=1e-6, attention_bias=False,
            mlp_bias=False, attention_dropout=0.0)).eval()
        for k, v in pre.state_dict().items():
            if k.startswith("layers."):
                sd["layers_pre_nn." + k.split(".", 1)[1]] = v
        torch.manual_seed(12)
        prefix = LlamaModel(lc).eval()
        for k, v in prefix.state_dict().items():
            if k.startswith("layers."):
                sd["layers_prefix." + k.split(".", 1)[1]] = v
        rng = np.random.RandomState(13)
        sd["embedding.weight"] = torch.tensor(
            rng.randn(dcfg.full_vocab, 896).astype(np.float32) * 0.02)
        sd["out_fnn.weight"] = torch.tensor(
            rng.randn(dcfg.full_vocab, 896).astype(np.float32) * 0.02)
        sd["out_fnn.bias"] = torch.zeros(dcfg.full_vocab)

        params = ckpt.convert_speech_decoder(
            {k: v.numpy() for k, v in sd.items()}, dcfg)
        params = jax.tree.map(jnp.asarray, params)
        return dcfg, llama, pre, params

    def test_full_dims_prefill_and_decode(self):
        from freeze_omni_tpu.models import speech_decoder as sdm

        dcfg, llama, pre, params = self._build()
        assert "prefix" in params  # kv_cache_prefix_finetune stack converted
        rng = np.random.RandomState(14)
        x = rng.randn(1, 12, 896).astype(np.float32)
        x2 = rng.randn(1, 1, 896).astype(np.float32)
        with torch.no_grad():
            out = llama(inputs_embeds=torch.tensor(x), use_cache=True)
            step = llama(inputs_embeds=torch.tensor(x2),
                         past_key_values=out.past_key_values)
        ref = out.last_hidden_state.numpy()
        ref_step = step.last_hidden_state.numpy()[:, -1]

        cache = sdm.init_cache(dcfg, 1)
        hidden, cache = sdm.prefill(params, dcfg, jnp.asarray(x),
                                    jnp.ones((1, 12), bool), cache)
        assert _rel_err(hidden, ref) < 1e-3
        h, cache = sdm.prefill(params, dcfg, jnp.asarray(x2),
                               jnp.ones((1, 1), bool), cache)
        assert _rel_err(h[:, 0], ref_step) < 1e-3

        # pre-NN (N/2 Llama layers over LLM hidden frames, decoder.py:162-188):
        # the reference applies NO final norm and a FULL (non-causal) mask, so
        # the golden loops the raw decoder layers exactly as pre_nn_forward does
        with torch.no_grad():
            hs = torch.tensor(x)
            pos_ids = torch.arange(hs.shape[1])[None]
            pos_emb = pre.rotary_emb(hs, pos_ids)
            full_mask = torch.zeros(1, 1, hs.shape[1], hs.shape[1])
            for layer in pre.layers:
                hs = layer(hs, attention_mask=full_mask, position_ids=pos_ids,
                           position_embeddings=pos_emb)
                if not isinstance(hs, torch.Tensor):
                    hs = hs[0]
            ref_pre = hs.numpy()
        got_pre = sdm.pre_nn(params, dcfg, jnp.asarray(x))
        assert _rel_err(got_pre, ref_pre) < 1e-3


class TestCodecFullDims:
    """TiCodec generator at the full published geometry: 512-channel ladder,
    (8,5,5,3) upsampling to 600x, 3 MRF kernel banks x (1,3,5) dilations,
    1024-code codebook, 8x16 global style tokens (ticodec/models.py:169-254)."""

    def test_full_generator_decode_matches_torch(self):
        import torch.nn as nn
        import torch.nn.functional as F

        from freeze_omni_tpu.config import CodecConfig
        from freeze_omni_tpu.models import codec as codec_mod

        cfg = CodecConfig()  # full defaults
        nk = len(cfg.resblock_kernel_sizes)
        torch.manual_seed(15)
        ch0 = cfg.upsample_initial_channel

        class TorchGen(nn.Module):
            def __init__(s):
                super().__init__()
                s.conv_pre = nn.Conv1d(512, ch0, 7, padding=3)
                s.ups = nn.ModuleList()
                s.res1 = nn.ModuleList()
                s.res2 = nn.ModuleList()
                c = ch0
                for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
                    s.ups.append(nn.ConvTranspose1d(c, c // 2, k, stride=u,
                                                    padding=(k - u) // 2))
                    c //= 2
                    for rk, ds in zip(cfg.resblock_kernel_sizes,
                                      cfg.resblock_dilation_sizes):
                        s.res1.append(nn.ModuleList(
                            [nn.Conv1d(c, c, rk, padding=(rk * d - d) // 2,
                                       dilation=d) for d in ds]))
                        s.res2.append(nn.ModuleList(
                            [nn.Conv1d(c, c, rk, padding=(rk - 1) // 2)
                             for _ in ds]))
                s.conv_post = nn.Conv1d(c, 1, 7, padding=3)

            def forward(s, x, gemb):
                x = s.conv_pre(x)
                for i in range(len(s.ups)):
                    x = F.leaky_relu(x, 0.1)
                    x = s.ups[i](x)
                    xs = None
                    for j in range(nk):
                        r = x
                        for c1, c2 in zip(s.res1[i * nk + j],
                                          s.res2[i * nk + j]):
                            xt = c1(F.leaky_relu(r, 0.1))
                            xt = c2(F.leaky_relu(xt, 0.1))
                            r = r + xt
                        xs = r if xs is None else xs + r
                    x = xs / nk
                    if x.shape[1] == gemb.shape[1]:
                        x = x + gemb[:, :, None]
                x = F.leaky_relu(x, 0.1)
                return torch.tanh(s.conv_post(x))

        tg = TorchGen().eval()

        gen_sd = {"conv_pre.weight": tg.conv_pre.weight.data,
                  "conv_pre.bias": tg.conv_pre.bias.data,
                  "conv_post.weight": tg.conv_post.weight.data,
                  "conv_post.bias": tg.conv_post.bias.data}
        for i, up in enumerate(tg.ups):
            gen_sd[f"ups.{i}.weight"] = up.weight.data
            gen_sd[f"ups.{i}.bias"] = up.bias.data
        for r, (r1, r2) in enumerate(zip(tg.res1, tg.res2)):
            for j, c in enumerate(r1):
                gen_sd[f"resblocks.{r}.convs1.{j}.weight"] = c.weight.data
                gen_sd[f"resblocks.{r}.convs1.{j}.bias"] = c.bias.data
            for j, c in enumerate(r2):
                gen_sd[f"resblocks.{r}.convs2.{j}.weight"] = c.weight.data
                gen_sd[f"resblocks.{r}.convs2.{j}.bias"] = c.bias.data
        rng = np.random.RandomState(16)
        gdim = cfg.global_feature_dim // cfg.global_code_num  # 16
        quant_sd = {"quantizer_modules.0.embedding.weight":
                    torch.tensor(rng.randn(cfg.n_codes, 512)
                                 .astype(np.float32))}
        for g in range(cfg.global_code_num):
            quant_sd[f"quantizer_modules_globaltokens.{g}.embedding.weight"] \
                = torch.tensor(rng.randn(cfg.n_codes, gdim)
                               .astype(np.float32))

        params = ckpt.convert_codec(
            {"generator": {k: v.numpy() for k, v in gen_sd.items()},
             "quantizer": {k: v.numpy() for k, v in quant_sd.items()}}, cfg)
        params = jax.tree.map(jnp.asarray, params)

        T = 4  # 4 codes -> 2400 samples at the 600x upsample rate
        codes = rng.randint(0, cfg.n_codes, (1, T, 1)).astype(np.int32)
        gtok = np.asarray(cfg.global_tokens, np.int32)[None, None]
        wav = codec_mod.decode(params, cfg, jnp.asarray(codes),
                               jnp.asarray(gtok))

        quant = quant_sd["quantizer_modules.0.embedding.weight"][codes[0, :, 0]]
        gemb = torch.cat([
            quant_sd[f"quantizer_modules_globaltokens.{g}.embedding.weight"][0]
            for g in range(cfg.global_code_num)])[None]
        with torch.no_grad():
            ref = tg(quant.T[None], gemb).numpy()
        # with odd (k-u) paddings the ConvTranspose stages overshoot the exact
        # 600x product by a few samples (llm2tts.py:148-150 trims to
        # chunk*600 downstream); parity means matching torch exactly
        assert wav.shape == ref.shape, (wav.shape, ref.shape)
        assert wav.shape[2] >= T * cfg.upsample_rate
        assert _rel_err(wav, ref) < 1e-3
