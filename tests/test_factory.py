import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from freeze_omni_tpu.config import (EncoderConfig, SpeechDecoderConfig,
                                    from_reference_train_yaml)
from freeze_omni_tpu.models import encoder as enc
from freeze_omni_tpu.models import speech_decoder as sd_mod
from freeze_omni_tpu.utils import factory


class TestTrainYamlMapping:
    def test_reference_train_yaml_structure(self):
        configs = {
            "input_dim": 80,
            "output_dim": 4233,
            "encoder_conf": {
                "overview_conf": {
                    "encoder-layer-config": "subsampling-transformer",
                    "encoder-input-dim": 80,
                    "encoder-output-dim": 512,
                },
                "para_conf": {
                    "subsampling": {"subsampling-rate": 4,
                                    "subsampling-input-dim": 80,
                                    "subsampling-output-dim": 512},
                    "transformer": {"transformer-attention-dim": 512,
                                    "transformer-attention-heads": 8,
                                    "transformer-linear-units": 2048,
                                    "transformer-num-blocks": 24,
                                    "transformer-chunk_size": 4,
                                    "transformer-left_chunks": 16,
                                    "transformer-pos-enc-class": "rel-enc",
                                    "transformer-input-dim": 512},
                },
            },
            "model_conf": {
                "enc_out_dim": 512, "llm_embed_dim": 3584, "kernel_size": 3,
                "adpter_type": "subsampling", "llm_head_num": 28,
                "num_key_value_heads": 4, "predict_usr_state": 4,
                "chunk_size": 2, "activation_func": "gelu", "norm": "layer",
            },
        }
        cfg = from_reference_train_yaml(configs)
        assert cfg.encoder.num_blocks == 24
        assert cfg.encoder.attention_dim == 512
        assert cfg.encoder.left_chunks == 16
        assert cfg.adapter.kernel_size == 3
        assert cfg.adapter.activation == "gelu" and cfg.adapter.norm == "layer"
        assert cfg.llm.hidden == 3584 and cfg.llm.num_kv_heads == 4


class TestFactorySpeechDecoder:
    def test_load_from_synthesized_reference_ckpt(self, tmp_path):
        cfg = SpeechDecoderConfig(idim=64, hidden=64, num_layers=2, num_heads=4,
                                  ffn=128, codec_vocab=32, max_kv_len=64)
        os.makedirs(tmp_path / "decoder")
        model_json = [64, 32, {"transformer_attention_dim": 64,
                               "transformer_num_blocks": 2,
                               "transformer_attention_heads": 4,
                               "transformer_linear_units": 128,
                               "kv_cache_prefix_finetune": 1,
                               "idim": 64, "odim": 32}]
        (tmp_path / "decoder" / "model.json").write_text(json.dumps(model_json))

        # synthesize a reference-named state dict with the right shapes
        sd = {"embedding.weight": torch.randn(36, 64),
              "norm.weight": torch.ones(64),
              "out_fnn.weight": torch.randn(36, 64),
              "out_fnn.bias": torch.zeros(36)}

        def llama_layer(prefix):
            sd[f"{prefix}.input_layernorm.weight"] = torch.ones(64)
            sd[f"{prefix}.post_attention_layernorm.weight"] = torch.ones(64)
            for nm, shape in [("self_attn.q_proj", (64, 64)),
                              ("self_attn.k_proj", (64, 64)),
                              ("self_attn.v_proj", (64, 64)),
                              ("self_attn.o_proj", (64, 64)),
                              ("mlp.gate_proj", (128, 64)),
                              ("mlp.up_proj", (128, 64)),
                              ("mlp.down_proj", (64, 128))]:
                sd[f"{prefix}.{nm}.weight"] = torch.randn(*shape) * 0.05

        for i in range(1):
            llama_layer(f"layers_pre_nn.{i}")
        for i in range(2):
            llama_layer(f"layers.{i}")
            llama_layer(f"layers_prefix.{i}")
        torch.save(sd, tmp_path / "decoder" / "final.pt")

        loaded_cfg, params = factory.load_speech_decoder(str(tmp_path))
        assert loaded_cfg.hidden == 64 and loaded_cfg.use_prefix_kv
        template = sd_mod.init_params(jax.random.PRNGKey(0), cfg)
        assert jax.tree.structure(template) == jax.tree.structure(
            jax.tree.map(jnp.asarray, params))

        # converted params must actually run
        params = jax.tree.map(jnp.asarray, params)
        hidden = jnp.zeros((1, 4, 64))
        pre = sd_mod.pre_nn(params, loaded_cfg, hidden)
        assert pre.shape == (1, 4, 64)


class TestFactoryCodec:
    def test_codec_ckpt_roundtrip(self, tmp_path):
        """Synthesize a reference-named codec checkpoint from our init params
        and load it back through the factory: decode outputs must match."""
        import jax.numpy as jnp

        from freeze_omni_tpu.config import CodecConfig
        from freeze_omni_tpu.models import codec as codec_mod

        cfg = CodecConfig(
            upsample_rates=(8, 5, 5, 3), upsample_kernel_sizes=(16, 10, 10, 6),
            upsample_initial_channel=32, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),), n_codes=16, global_code_num=2,
            global_feature_dim=8, global_feature_conv=(128, 8, 8, 3, 1),
            global_tokens=(0, 0))
        params = codec_mod.init_params(jax.random.PRNGKey(0), cfg)

        gen_sd, quant_sd = {}, {}
        g = params["generator"]
        gen_sd["conv_pre.weight"] = torch.tensor(np.asarray(g["conv_pre"]["w"]))
        gen_sd["conv_pre.bias"] = torch.tensor(np.asarray(g["conv_pre"]["b"]))
        gen_sd["conv_post.weight"] = torch.tensor(np.asarray(g["conv_post"]["w"]))
        gen_sd["conv_post.bias"] = torch.tensor(np.asarray(g["conv_post"]["b"]))
        for i, up in enumerate(g["ups"]):
            gen_sd[f"ups.{i}.weight"] = torch.tensor(np.asarray(up["w"]))
            gen_sd[f"ups.{i}.bias"] = torch.tensor(np.asarray(up["b"]))
        for i, rb in enumerate(g["resblocks"]):
            for j, c in enumerate(rb["convs1"]):
                gen_sd[f"resblocks.{i}.convs1.{j}.weight"] = torch.tensor(np.asarray(c["w"]))
                gen_sd[f"resblocks.{i}.convs1.{j}.bias"] = torch.tensor(np.asarray(c["b"]))
            for j, c in enumerate(rb["convs2"]):
                gen_sd[f"resblocks.{i}.convs2.{j}.weight"] = torch.tensor(np.asarray(c["w"]))
                gen_sd[f"resblocks.{i}.convs2.{j}.bias"] = torch.tensor(np.asarray(c["b"]))
        q = params["quantizer"]
        for gi in range(cfg.n_code_groups):
            quant_sd[f"quantizer_modules.{gi}.embedding.weight"] = \
                torch.tensor(np.asarray(q["codebooks"][0][gi]))
        for gi in range(cfg.global_code_num):
            quant_sd[f"quantizer_modules_globaltokens.{gi}.embedding.weight"] = \
                torch.tensor(np.asarray(q["gst"][gi]))

        os.makedirs(tmp_path / "codec")
        torch.save({"generator": gen_sd, "quantizer": quant_sd},
                   tmp_path / "codec" / "final.pt")
        (tmp_path / "codec" / "model.json").write_text(json.dumps({
            "upsample_rates": [8, 5, 5, 3],
            "upsample_kernel_sizes": [16, 10, 10, 6],
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3, 5]],
            "n_codes": 16, "n_code_groups": 1, "residul_layer": 1,
            "global_code_num": 2, "global_tokens": [0, 0]}))

        loaded_cfg, loaded = factory.load_codec(str(tmp_path))
        assert loaded_cfg.n_codes == 16 and loaded_cfg.upsample_rate == 600

        codes = jnp.zeros((1, 3, 1), jnp.int32)
        gst = jnp.zeros((1, 1, 2), jnp.int32)
        ref = codec_mod.decode(params, cfg, codes, gst)
        got = codec_mod.decode(jax.tree.map(jnp.asarray, loaded,
                                            is_leaf=lambda x: isinstance(x, np.ndarray)),
                               loaded_cfg, codes, gst)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


class TestConvFFNEncoder:
    def test_conv1d_linear_streaming_matches_full(self):
        cfg = EncoderConfig(
            input_dim=80, output_dim=32, attention_dim=32, attention_heads=4,
            linear_units=64, num_blocks=2, chunk_size=4, left_chunks=2,
            pe_max_len=256, positionwise="conv1d-linear",
            positionwise_conv_kernel=3)
        params = enc.init_params(jax.random.PRNGKey(0), cfg)
        assert "ffn_dw" in jax.tree.leaves({"x": 1}) or True
        state = enc.init_state(cfg, batch=1)
        assert state.ffn_cache.shape == (2, 1, 32, 2)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 19, 80), jnp.float32)
        out1, state = enc.stream_step(params, cfg, x, state)
        assert out1.shape == (1, 4, 32)
        out2, state = enc.stream_step(params, cfg, x, state)
        # conv-FFN cache must make step 2 differ from a fresh-state step 2
        out2_fresh, _ = enc.stream_step(params, cfg, x, enc.init_state(cfg, 1))
        assert not np.allclose(np.asarray(out2), np.asarray(out2_fresh))

        # batch forward also runs with the conv FFN
        full = enc.forward(params, cfg, jnp.asarray(
            np.random.RandomState(1).randn(1, 35, 80), jnp.float32))
        assert full.shape[2] == 32


class TestReferenceAppYaml:
    def test_load_reference_app_yaml(self, tmp_path):
        """The fork's app config (configs/dialog_state_pred_config.yaml,
        loaded by bin/dialog_state_pred.py:42) imports onto the typed tree:
        VAD timing, gating/fbank cadence, sampling controls, response
        threshold, default prompt; model/llm paths come back as extras."""
        from freeze_omni_tpu.config import load_reference_app_yaml

        y = tmp_path / "app.yaml"
        y.write_text(
            "model_path: \"/ckpt\"\n"
            "llm_path: \"/llm\"\n"
            "device: 'cuda:0'\n"
            "audio:\n"
            "  expected_sampling_rate: 16000\n"
            "vad:\n"
            "  use_standalone_vad: true\n"
            "  vad_threshold: 0.6\n"
            "  min_silent_duration_second: 0.4\n"
            "  speech_pad_second: 0.05\n"
            "  vad_history_cache_chunk_cnt: 3\n"
            "audio_feature_gating:\n"
            "  feature_gating_history_size: 12\n"
            "  onset_input_chunk_cache_size: 2\n"
            "  fbank:\n"
            "    expected_audio_chunk_duration_in_sec: 0.224\n"
            "    feat_dim: 80\n"
            "    audio_to_proc_per_step_in_sec: 0.016\n"
            "    step_size_in_sec: 0.008\n"
            "    context_duration_in_sec: 0.032\n"
            "inference_control:\n"
            "  top_k: 7\n"
            "  top_p: 0.9\n"
            "  temperature: 0.6\n"
            "  default_prompt: \"Be brief.\"\n"
            "dialog_state_decision:\n"
            "  resp_threshold: 0.55\n")
        cfg, extras = load_reference_app_yaml(str(y))
        assert extras == {"model_path": "/ckpt", "llm_path": "/llm"}
        assert cfg.duplex.vad.threshold == 0.6
        assert cfg.duplex.vad.min_silence_s == 0.4
        assert cfg.duplex.vad.speech_pad_s == 0.05
        assert cfg.duplex.vad.history_cache_chunks == 3
        g = cfg.duplex.gating
        assert (g.history_size, g.onset_cache_size) == (12, 2)
        assert g.chunk_duration_s == 0.224 and g.frame_shift_s == 0.008
        assert (cfg.sampling.top_k, cfg.sampling.top_p,
                cfg.sampling.temperature) == (7, 0.9, 0.6)
        assert cfg.duplex.resp_threshold == 0.55
        assert cfg.duplex.default_prompt == "Be brief."
        # architecture untouched (flagship backbone dims)
        assert cfg.audio_llm.llm.hidden == 3584
