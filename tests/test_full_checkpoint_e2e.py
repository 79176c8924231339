"""End-to-end checkpoint workflow: a complete synthetic reference checkpoint
directory (audiollm train.yaml + global_cmvn + final.pt, HF LLM dir, decoder
and codec model.json + final.pt) loads through the factory and drives the
offline CLI — the exact path a reference user takes with real weights."""

import argparse
import json
import os

import numpy as np
import pytest
import torch
import yaml


def _make_audiollm_ckpt(tmp_path, enc_dim=16, llm_dim=128):
    """Reference-named audiollm state dict + train.yaml + cmvn."""
    os.makedirs(tmp_path / "audiollm")
    sd = {}
    f_sub = ((80 - 1) // 2 - 1) // 2
    rng = np.random.RandomState(0)

    def t(*shape, scale=0.05):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * scale)

    for who in ("encoder_user", "encoder_system"):
        sd[f"{who}.global_cmvn.mean"] = torch.zeros(80)
        sd[f"{who}.global_cmvn.istd"] = torch.ones(80)
        sd[f"{who}.enc.0.core.conv.0.weight"] = t(enc_dim, 1, 3, 3)
        sd[f"{who}.enc.0.core.conv.0.bias"] = torch.zeros(enc_dim)
        sd[f"{who}.enc.0.core.conv.2.weight"] = t(enc_dim, enc_dim, 3, 3)
        sd[f"{who}.enc.0.core.conv.2.bias"] = torch.zeros(enc_dim)
        sd[f"{who}.enc.0.core.out.0.weight"] = t(enc_dim, enc_dim * f_sub)
        sd[f"{who}.enc.0.core.out.0.bias"] = torch.zeros(enc_dim)
        sd[f"{who}.enc.1.embed.0.weight"] = t(enc_dim, enc_dim)
        sd[f"{who}.enc.1.embed.0.bias"] = torch.zeros(enc_dim)
        sd[f"{who}.enc.1.embed.1.weight"] = torch.ones(enc_dim)
        sd[f"{who}.enc.1.embed.1.bias"] = torch.zeros(enc_dim)
        sd[f"{who}.enc.1.after_norm.weight"] = torch.ones(enc_dim)
        sd[f"{who}.enc.1.after_norm.bias"] = torch.zeros(enc_dim)
        for i in range(2):
            b = f"{who}.enc.1.encoders.{i}"
            for nm in ("linear_q", "linear_k", "linear_v", "linear_out"):
                sd[f"{b}.self_attn.{nm}.weight"] = t(enc_dim, enc_dim)
                sd[f"{b}.self_attn.{nm}.bias"] = torch.zeros(enc_dim)
            sd[f"{b}.self_attn.linear_pos.weight"] = t(enc_dim, enc_dim)
            sd[f"{b}.self_attn.pos_bias_u"] = t(2, enc_dim // 2)
            sd[f"{b}.self_attn.pos_bias_v"] = t(2, enc_dim // 2)
            for nm in ("norm1", "norm2"):
                sd[f"{b}.{nm}.weight"] = torch.ones(enc_dim)
                sd[f"{b}.{nm}.bias"] = torch.zeros(enc_dim)
            sd[f"{b}.feed_forward.w_1.weight"] = t(32, enc_dim)
            sd[f"{b}.feed_forward.w_1.bias"] = torch.zeros(32)
            sd[f"{b}.feed_forward.w_2.weight"] = t(enc_dim, 32)
            sd[f"{b}.feed_forward.w_2.bias"] = torch.zeros(enc_dim)
    for who in ("adpter_user", "adpter_system"):
        # one-stage variant: enc_dim*4 >= llm_dim is false here -> two-stage
        sd[f"{who}.conv1d1.weight"] = t(2 * enc_dim, enc_dim, 5)
        sd[f"{who}.conv1d1.bias"] = torch.zeros(2 * enc_dim)
        for bn, c in (("bn1", 2 * enc_dim), ("bn2", 4 * enc_dim)):
            sd[f"{who}.{bn}.weight"] = torch.ones(c)
            sd[f"{who}.{bn}.bias"] = torch.zeros(c)
            sd[f"{who}.{bn}.running_mean"] = torch.zeros(c)
            sd[f"{who}.{bn}.running_var"] = torch.ones(c)
        sd[f"{who}.conv1d2.weight"] = t(4 * enc_dim, 2 * enc_dim, 5)
        sd[f"{who}.conv1d2.bias"] = torch.zeros(4 * enc_dim)
        sd[f"{who}.project.weight"] = t(llm_dim, 4 * enc_dim)
        sd[f"{who}.project.bias"] = torch.zeros(llm_dim)
    sd["predictor_head.weight"] = t(4, llm_dim)
    sd["predictor_head.bias"] = torch.zeros(4)
    torch.save(sd, tmp_path / "audiollm" / "final.pt")

    train_yaml = {
        "input_dim": 80, "output_dim": 64, "is_json_cmvn": True,
        "encoder_conf": {
            "overview_conf": {
                "encoder-layer-config": "subsampling-transformer",
                "encoder-input-dim": 80, "encoder-output-dim": enc_dim},
            "para_conf": {
                "subsampling": {"subsampling-rate": 4,
                                "subsampling-input-dim": 80,
                                "subsampling-output-dim": enc_dim},
                "transformer": {"transformer-attention-dim": enc_dim,
                                "transformer-attention-heads": 2,
                                "transformer-linear-units": 32,
                                "transformer-num-blocks": 2,
                                "transformer-chunk_size": 4,
                                "transformer-left_chunks": 4,
                                "transformer-pos-enc-class": "rel-enc",
                                "transformer-input-dim": enc_dim,
                                "transformer-output-dim": enc_dim}}},
        "model_conf": {"enc_out_dim": enc_dim, "llm_embed_dim": llm_dim,
                       "kernel_size": 5, "adpter_type": "subsampling",
                       "llm_head_num": 4, "num_key_value_heads": 2,
                       "predict_usr_state": 4, "chunk_size": 2},
    }
    (tmp_path / "audiollm" / "train.yaml").write_text(yaml.dump(train_yaml))
    frames = np.random.RandomState(1).randn(500, 80) * 2 + 1
    (tmp_path / "audiollm" / "global_cmvn").write_text(json.dumps({
        "mean_stat": frames.sum(0).tolist(),
        "var_stat": (frames ** 2).sum(0).tolist(),
        "frame_num": 500}))


def _make_hf_llm(tmp_path, hidden=128):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(hidden_size=hidden, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=256, vocab_size=256, rope_theta=1e6,
                      rms_norm_eps=1e-6, tie_word_embeddings=False)
    torch.manual_seed(0)
    Qwen2ForCausalLM(cfg).save_pretrained(tmp_path / "llm")


def _make_decoder_ckpt(tmp_path, idim=32):
    os.makedirs(tmp_path / "decoder")
    rng = np.random.RandomState(2)

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)

    sd = {"embedding.weight": t(36, idim), "norm.weight": torch.ones(idim),
          "out_fnn.weight": t(36, idim), "out_fnn.bias": torch.zeros(36)}

    def llama(prefix):
        sd[f"{prefix}.input_layernorm.weight"] = torch.ones(idim)
        sd[f"{prefix}.post_attention_layernorm.weight"] = torch.ones(idim)
        for nm, shape in [("self_attn.q_proj", (idim, idim)),
                          ("self_attn.k_proj", (idim, idim)),
                          ("self_attn.v_proj", (idim, idim)),
                          ("self_attn.o_proj", (idim, idim)),
                          ("mlp.gate_proj", (64, idim)),
                          ("mlp.up_proj", (64, idim)),
                          ("mlp.down_proj", (idim, 64))]:
            sd[f"{prefix}.{nm}.weight"] = t(*shape)

    llama("layers_pre_nn.0")
    for i in range(2):
        llama(f"layers.{i}")
        llama(f"layers_prefix.{i}")
    torch.save(sd, tmp_path / "decoder" / "final.pt")
    (tmp_path / "decoder" / "model.json").write_text(json.dumps(
        [idim, 32, {"transformer_attention_dim": idim,
                    "transformer_num_blocks": 2,
                    "transformer_attention_heads": 4,
                    "transformer_linear_units": 64,
                    "kv_cache_prefix_finetune": 1,
                    "idim": idim, "odim": 32}]))


def _make_codec_ckpt(tmp_path):
    """Reuse the roundtrip synthesis from test_factory for a tiny codec."""
    import jax

    from freeze_omni_tpu.config import CodecConfig
    from freeze_omni_tpu.models import codec as codec_mod

    cfg = CodecConfig(
        upsample_rates=(8, 5, 5, 3), upsample_kernel_sizes=(16, 10, 10, 6),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), n_codes=32, global_code_num=2,
        global_feature_dim=8, global_feature_conv=(128, 8, 8, 3, 1),
        global_tokens=(0, 0))
    params = codec_mod.init_params(jax.random.PRNGKey(0), cfg)
    gen_sd, quant_sd = {}, {}
    g = params["generator"]
    for name in ("conv_pre", "conv_post"):
        gen_sd[f"{name}.weight"] = torch.tensor(np.asarray(g[name]["w"]))
        gen_sd[f"{name}.bias"] = torch.tensor(np.asarray(g[name]["b"]))
    for i, up in enumerate(g["ups"]):
        gen_sd[f"ups.{i}.weight"] = torch.tensor(np.asarray(up["w"]))
        gen_sd[f"ups.{i}.bias"] = torch.tensor(np.asarray(up["b"]))
    for i, rb in enumerate(g["resblocks"]):
        for grp in ("convs1", "convs2"):
            for j, c in enumerate(rb[grp]):
                gen_sd[f"resblocks.{i}.{grp}.{j}.weight"] = \
                    torch.tensor(np.asarray(c["w"]))
                gen_sd[f"resblocks.{i}.{grp}.{j}.bias"] = \
                    torch.tensor(np.asarray(c["b"]))
    q = params["quantizer"]
    quant_sd["quantizer_modules.0.embedding.weight"] = \
        torch.tensor(np.asarray(q["codebooks"][0][0]))
    for gi in range(2):
        quant_sd[f"quantizer_modules_globaltokens.{gi}.embedding.weight"] = \
            torch.tensor(np.asarray(q["gst"][gi]))
    os.makedirs(tmp_path / "codec")
    torch.save({"generator": gen_sd, "quantizer": quant_sd},
               tmp_path / "codec" / "final.pt")
    (tmp_path / "codec" / "model.json").write_text(json.dumps({
        "upsample_rates": [8, 5, 5, 3], "upsample_kernel_sizes": [16, 10, 10, 6],
        "upsample_initial_channel": 32, "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]], "n_codes": 32,
        "n_code_groups": 1, "residul_layer": 1, "global_code_num": 2,
        "global_tokens": [0, 0]}))


class TestFullCheckpointWorkflow:
    def test_build_system_and_run_offline_cli(self, tmp_path):
        _make_audiollm_ckpt(tmp_path)
        _make_hf_llm(tmp_path)
        _make_decoder_ckpt(tmp_path)
        _make_codec_ckpt(tmp_path)

        from freeze_omni_tpu.bin.offline_infer import run_inference
        from freeze_omni_tpu.frontend.wav import read_wav, write_wav

        sr = 16000
        t = np.arange(sr // 2) / sr
        in_wav = str(tmp_path / "in.wav")
        out_wav = str(tmp_path / "out.wav")
        write_wav(in_wav, (0.3 * np.sin(2 * np.pi * 280 * t)).astype(np.float32),
                  sr)

        args = argparse.Namespace(
            input_wav=in_wav, output_wav=out_wav, max_tokens=6, seed=0,
            top_k=5, top_p=0.8, temperature=0.7,
            model_path=str(tmp_path), llm_path=str(tmp_path / "llm"))
        text, audio = run_inference(None, args)
        assert isinstance(text, str)
        assert audio.shape[0] > 0
        back, osr = read_wav(out_wav)
        assert osr == 24000 and back.shape[0] == audio.shape[0]

    def test_factory_returns_tts_params_and_tokenizer(self, tmp_path):
        """Real-weight servers must get the converted TTS weights and a
        tokenizer from the factory (not random init / ByteTokenizer silently):
        ADVICE r1 high findings on bin/serve.py and bin/asr_eval.py."""
        _make_audiollm_ckpt(tmp_path)
        _make_hf_llm(tmp_path)
        _make_decoder_ckpt(tmp_path)
        _make_codec_ckpt(tmp_path)

        from freeze_omni_tpu.utils.factory import build_system_from_reference

        cfg, audiollm, tts, tok = build_system_from_reference(
            str(tmp_path), str(tmp_path / "llm"))
        assert set(tts) == {"decoder", "codec"}
        assert "generator" in tts["codec"]
        # this synthetic HF dir has no tokenizer files -> documented fallback
        assert tok.decode(tok.encode("hi")) == "hi"

        # the server wires the converted TTS params into the responder path
        from freeze_omni_tpu.bin import serve as serve_mod

        args = serve_mod.get_args(
            ["--model_path", str(tmp_path), "--llm_path",
             str(tmp_path / "llm"), "--respond", "--resp_threshold", "0.0"])
        server = serve_mod.Server(args)
        got = server.responder.tts.params["codec"]["quantizer"]["codebooks"]
        want = tts["codec"]["quantizer"]["codebooks"]
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]))

    def test_factory_quantizes_llm_on_load(self, tmp_path):
        """quantize_llm_bits=8: the converted backbone comes back weight-only
        int8 (the bf16 7B cannot fit one 16 GB chip next to its KV), and the
        quantized forward stays close to the bf16 one."""
        import jax
        import jax.numpy as jnp

        _make_audiollm_ckpt(tmp_path)
        _make_hf_llm(tmp_path)
        _make_decoder_ckpt(tmp_path)
        _make_codec_ckpt(tmp_path)

        from freeze_omni_tpu.models import qwen2
        from freeze_omni_tpu.utils.factory import build_system_from_reference

        cfg, full, _, _ = build_system_from_reference(
            str(tmp_path), str(tmp_path / "llm"))
        cfg_q, quant, _, _ = build_system_from_reference(
            str(tmp_path), str(tmp_path / "llm"), quantize_llm_bits=8)
        assert "w_q" in quant["llm"]["layers"]["q"]
        assert quant["llm"]["layers"]["q"]["w_q"].dtype == jnp.int8

        ids = jnp.asarray([[3, 5, 7]])
        emb_f = qwen2.embed_tokens(full["llm"], ids).astype(jnp.float32)
        kv_f = qwen2.init_cache(cfg.audio_llm.llm, 1, dtype=jnp.float32)
        h_f, _ = qwen2.forward(full["llm"], cfg.audio_llm.llm, emb_f,
                               jnp.ones((1, 3), bool), kv_f)
        kv_q = qwen2.init_cache(cfg_q.audio_llm.llm, 1, dtype=jnp.float32)
        h_q, _ = qwen2.forward(quant["llm"], cfg_q.audio_llm.llm, emb_f,
                               jnp.ones((1, 3), bool), kv_q)
        rel = np.abs(np.asarray(h_q) - np.asarray(h_f)).max() / \
            (np.abs(np.asarray(h_f)).max() + 1e-6)
        assert rel < 0.05, rel

    def test_native_checkpoint_roundtrip(self, tmp_path):
        """convert_ckpt: reference dir -> native orbax system; restarting
        from the native dir restores bit-identical (quantized) pytrees and
        the config (tuples stay tuples — the config is a jit static arg)."""
        import jax

        _make_audiollm_ckpt(tmp_path)
        _make_hf_llm(tmp_path)
        _make_decoder_ckpt(tmp_path)
        _make_codec_ckpt(tmp_path)

        from freeze_omni_tpu.bin import convert_ckpt
        from freeze_omni_tpu.utils.factory import (
            build_system_from_reference, is_native_system,
            load_native_system)

        out = tmp_path / "native"
        convert_ckpt.main(["--model_path", str(tmp_path), "--llm_path",
                           str(tmp_path / "llm"), "--out", str(out),
                           "--quant", "8"])
        assert is_native_system(str(out))

        cfg_ref, audiollm_ref, tts_ref, _ = build_system_from_reference(
            str(tmp_path), str(tmp_path / "llm"), quantize_llm_bits=8)
        cfg, audiollm, tts, tok = load_native_system(str(out))

        assert cfg == cfg_ref  # incl. tuple-typed fields (hashable)
        hash(cfg)
        for got, want in ((audiollm, audiollm_ref), (tts, tts_ref)):
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)), got, want)

        # the server path accepts the native dir directly
        from freeze_omni_tpu.bin import serve as serve_mod

        args = serve_mod.get_args(["--model_path", str(out)])
        server = serve_mod.Server(args)
        assert "w_q" in server._ckpt_params["llm"]["layers"]["q"]

    def test_native_checkpoint_tokenizer_self_contained(self, tmp_path):
        """ADVICE r2 (medium): the tokenizer files are COPIED into the native
        checkpoint at convert time and preferred at load, so a converted
        checkpoint serves on hosts where the HF dir is gone; a real-vocab
        checkpoint that would silently fall back to the ByteTokenizer (whose
        decode drops ids >= 256 -> empty text) is a hard error."""
        import shutil

        import pytest

        _make_audiollm_ckpt(tmp_path)
        _make_hf_llm(tmp_path)
        _make_decoder_ckpt(tmp_path)
        _make_codec_ckpt(tmp_path)
        # give the fixture LLM dir a real, loadable fast tokenizer
        import json as _json

        from tokenizers import Tokenizer
        from tokenizers.models import WordLevel
        from tokenizers.pre_tokenizers import Whitespace

        vocab = {"<|im_start|>": 0, "<|im_end|>": 1, "hi": 2, "[UNK]": 3}
        t = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
        t.pre_tokenizer = Whitespace()
        t.save(str(tmp_path / "llm" / "tokenizer.json"))
        with open(tmp_path / "llm" / "tokenizer_config.json", "w") as f:
            _json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                        "eos_token": "<|im_end|>"}, f)

        from freeze_omni_tpu.bin import convert_ckpt
        from freeze_omni_tpu.utils.factory import load_native_system
        from freeze_omni_tpu.utils.tokenizer import (ByteTokenizer,
                                                     HFTokenizer)

        out = tmp_path / "native"
        convert_ckpt.main(["--model_path", str(tmp_path), "--llm_path",
                           str(tmp_path / "llm"), "--out", str(out),
                           "--quant", "8"])
        assert (out / "tokenizer" / "tokenizer.json").is_file()

        # the original HF dir disappears (new serving host)
        shutil.rmtree(tmp_path / "llm")
        _, _, _, tok = load_native_system(str(out))
        assert isinstance(tok, HFTokenizer)

        # real-vocab config + no tokenizer anywhere -> loud error
        shutil.rmtree(out / "tokenizer")
        cfg_file = out / "config.json"
        doc = _json.loads(cfg_file.read_text())
        doc["audio_llm"]["llm"]["vocab_size"] = 152064
        cfg_file.write_text(_json.dumps(doc))
        with pytest.raises(RuntimeError, match="ByteTokenizer"):
            load_native_system(str(out))
        _, _, _, tok = load_native_system(str(out), allow_byte_tokenizer=True)
        assert isinstance(tok, ByteTokenizer)
