"""Checkpoint conversion + native save/load.

The reference loads: `checkpoints/audiollm/final.pt` (strict=False partial
load, models/utils.py:11-28), the HF Qwen2-7B-Instruct weights
(models/audioLLM.py:70-74), `checkpoints/decoder/final.pt`
(models/decoder/llm2tts.py:41-68) and `checkpoints/codec/final.pt` (split into
generator/quantizer/encoder, ticodec/vqvae.py:21-35). This module converts
those torch state_dicts into this framework's param pytrees (transposing
torch's [out, in] linear layout to our [in, out], folding buffers), and saves/
restores native checkpoints with orbax.

Conversion is name-driven and shape-checked; missing keys are reported, not
fatal (the reference's strict=False semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import (AdapterConfig, AudioLLMConfig, CodecConfig, EncoderConfig,
                      LLMConfig, SpeechDecoderConfig)


def _t(x) -> np.ndarray:
    """torch tensor/np -> np.float32 array."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd: dict, name: str, bias: bool = True) -> dict:
    p = {"w": _t(sd[f"{name}.weight"]).T}  # torch [out,in] -> ours [in,out]
    if bias and f"{name}.bias" in sd:
        p["b"] = _t(sd[f"{name}.bias"])
    return p


def _ln(sd: dict, name: str) -> dict:
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def _rms(sd: dict, name: str) -> dict:
    return {"scale": _t(sd[f"{name}.weight"])}


def _bn(sd: dict, name: str) -> dict:
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"]),
            "mean": _t(sd[f"{name}.running_mean"]),
            "var": _t(sd[f"{name}.running_var"])}


def _conv1d(sd: dict, name: str) -> dict:
    p = {"w": _t(sd[f"{name}.weight"])}  # [out, in, k] matches ours
    if f"{name}.bias" in sd:
        p["b"] = _t(sd[f"{name}.bias"])
    return p


def _stack(layers: List[dict]) -> dict:
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


# ---------------------------------------------------------------------------
# speech encoder (audiollm ckpt, prefix e.g. 'encoder_user.')
# ---------------------------------------------------------------------------


def convert_encoder(sd: dict, cfg: EncoderConfig, prefix: str) -> dict:
    """Keys per models/encoder/*: {prefix}enc.0 = Subsampling, {prefix}enc.1 =
    Transformer; cmvn under {prefix}global_cmvn."""
    out = {}
    if f"{prefix}global_cmvn.mean" in sd:
        # GlobalCMVN registers mean/istd as buffers, so checkpoints CAN carry
        # them — and when they do, the reference's load order makes the ckpt
        # values win over the global_cmvn stats file (init_encoder_llm builds
        # from the file, models/utils.load_checkpoint overwrites strict=False)
        out["cmvn"] = {
            "mean": _t(sd[f"{prefix}global_cmvn.mean"]),
            "istd": _t(sd[f"{prefix}global_cmvn.istd"]),
        }
    sub = f"{prefix}enc.0.core"
    out["sub"] = {
        "conv1": {"w": _t(sd[f"{sub}.conv.0.weight"]),
                  "b": _t(sd[f"{sub}.conv.0.bias"])},
        "conv2": {"w": _t(sd[f"{sub}.conv.2.weight"]),
                  "b": _t(sd[f"{sub}.conv.2.bias"])},
        "out": _linear(sd, f"{sub}.out.0"),
    }
    tr = f"{prefix}enc.1"
    out["embed"] = {"lin": _linear(sd, f"{tr}.embed.0"),
                    "ln": _ln(sd, f"{tr}.embed.1")}
    blocks = []
    for i in range(cfg.num_blocks):
        b = f"{tr}.encoders.{i}"
        blk = {
            "ln1": _ln(sd, f"{b}.norm1"),
            "q": _linear(sd, f"{b}.self_attn.linear_q"),
            "k": _linear(sd, f"{b}.self_attn.linear_k"),
            "v": _linear(sd, f"{b}.self_attn.linear_v"),
            "o": _linear(sd, f"{b}.self_attn.linear_out"),
            "ln2": _ln(sd, f"{b}.norm2"),
        }
        if cfg.pos_enc == "rel-enc":
            # abs-enc checkpoints carry no linear_pos / pos biases
            # (attention.py:308-312: Identity + dummy tensors)
            blk["pos"] = _linear(sd, f"{b}.self_attn.linear_pos", bias=False)
            blk["bias_u"] = _t(sd[f"{b}.self_attn.pos_bias_u"])
            blk["bias_v"] = _t(sd[f"{b}.self_attn.pos_bias_v"])
        if f"{b}.feed_forward.w_1.0.weight" in sd:
            # Conv1dLinear positionwise (attention.py:198-266)
            blk["ffn_dw"] = _conv1d(sd, f"{b}.feed_forward.w_1.0")
            blk["ffn_pw"] = _conv1d(sd, f"{b}.feed_forward.w_1.1")
            blk["ffn2"] = _linear(sd, f"{b}.feed_forward.w_2")
        elif _t(sd[f"{b}.feed_forward.w_1.weight"]).ndim == 3:
            # MultiLayeredConv1d positionwise (attention.py:145-196)
            blk["ffn_c1"] = _conv1d(sd, f"{b}.feed_forward.w_1")
            blk["ffn_c2"] = _conv1d(sd, f"{b}.feed_forward.w_2")
        else:
            blk["ffn1"] = _linear(sd, f"{b}.feed_forward.w_1")
            blk["ffn2"] = _linear(sd, f"{b}.feed_forward.w_2")
        blocks.append(blk)
    out["blocks"] = _stack(blocks)
    out["after_norm"] = _ln(sd, f"{tr}.after_norm")
    return out


def convert_adapter(sd: dict, cfg: AdapterConfig, prefix: str) -> dict:
    out = {}
    if cfg.two_stage:
        out["conv1"] = _conv1d(sd, f"{prefix}conv1d1")
        out["bn1"] = _bn(sd, f"{prefix}bn1")
    out["conv2"] = _conv1d(sd, f"{prefix}conv1d2")
    if f"{prefix}bn2.running_mean" in sd:
        out["bn2"] = _bn(sd, f"{prefix}bn2")
    else:
        out["bn2"] = _ln(sd, f"{prefix}bn2")
    out["proj"] = _linear(sd, f"{prefix}project")
    return out


# ---------------------------------------------------------------------------
# Qwen2 backbone (HF state_dict)
# ---------------------------------------------------------------------------


def convert_hf_qwen2(sd: dict, cfg: LLMConfig, prefix: str = "model.") -> dict:
    layers = []
    for i in range(cfg.num_layers):
        b = f"{prefix}layers.{i}"
        layers.append({
            "ln1": _rms(sd, f"{b}.input_layernorm"),
            "q": _linear(sd, f"{b}.self_attn.q_proj", bias=cfg.qkv_bias),
            "k": _linear(sd, f"{b}.self_attn.k_proj", bias=cfg.qkv_bias),
            "v": _linear(sd, f"{b}.self_attn.v_proj", bias=cfg.qkv_bias),
            "o": _linear(sd, f"{b}.self_attn.o_proj", bias=False),
            "ln2": _rms(sd, f"{b}.post_attention_layernorm"),
            "gate": _linear(sd, f"{b}.mlp.gate_proj", bias=False),
            "up": _linear(sd, f"{b}.mlp.up_proj", bias=False),
            "down": _linear(sd, f"{b}.mlp.down_proj", bias=False),
        })
    params = {
        "embed": {"w": _t(sd[f"{prefix}embed_tokens.weight"])},
        "layers": _stack(layers),
        "final_norm": _rms(sd, f"{prefix}norm"),
    }
    if not cfg.tie_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"w": _t(sd["lm_head.weight"]).T}
    return params


def convert_audiollm(sd: dict, cfg: AudioLLMConfig) -> dict:
    """checkpoints/audiollm/final.pt -> encoder/adapter/predictor pytrees.
    (The LLM itself comes from the HF checkpoint.)"""
    out = {
        "encoder_user": convert_encoder(sd, cfg.encoder, "encoder_user."),
        "encoder_system": convert_encoder(sd, cfg.encoder, "encoder_system."),
        "adapter_user": convert_adapter(sd, cfg.adapter, "adpter_user."),
        "adapter_system": convert_adapter(sd, cfg.adapter, "adpter_system."),
    }
    if "predictor_head.weight" in sd:
        out["predictor"] = _linear(sd, "predictor_head")
    # task/prompt/prefix-tuning tables (audioLLM.py:169-195)
    if "task_embeddings.weight" in sd:
        out["task_embeddings"] = _t(sd["task_embeddings.weight"])
    if "prompt_embeddings.weight" in sd:
        out["prompt_embeddings"] = _t(sd["prompt_embeddings.weight"])
    if "prefix_embeddings.0.0.weight" in sd:
        L = cfg.llm.num_layers
        out["prefix_embeddings"] = np.stack([
            np.stack([_t(sd[f"prefix_embeddings.{i}.0.weight"]),
                      _t(sd[f"prefix_embeddings.{i}.1.weight"])])
            for i in range(L)])
    return out


# ---------------------------------------------------------------------------
# speech decoder + codec
# ---------------------------------------------------------------------------


def _llama_layer(sd: dict, b: str) -> dict:
    return {
        "ln1": _rms(sd, f"{b}.input_layernorm"),
        "q": _linear(sd, f"{b}.self_attn.q_proj", bias=False),
        "k": _linear(sd, f"{b}.self_attn.k_proj", bias=False),
        "v": _linear(sd, f"{b}.self_attn.v_proj", bias=False),
        "o": _linear(sd, f"{b}.self_attn.o_proj", bias=False),
        "ln2": _rms(sd, f"{b}.post_attention_layernorm"),
        "gate": _linear(sd, f"{b}.mlp.gate_proj", bias=False),
        "up": _linear(sd, f"{b}.mlp.up_proj", bias=False),
        "down": _linear(sd, f"{b}.mlp.down_proj", bias=False),
    }


def convert_speech_decoder(sd: dict, cfg: SpeechDecoderConfig) -> dict:
    out = {
        "embedding": {"w": _t(sd["embedding.weight"])},
        "pre_nn": _stack([_llama_layer(sd, f"layers_pre_nn.{i}")
                          for i in range(cfg.num_pre_nn_layers)]),
        "layers": _stack([_llama_layer(sd, f"layers.{i}")
                          for i in range(cfg.num_layers)]),
        "final_norm": _rms(sd, "norm"),
        "out": _linear(sd, "out_fnn"),
    }
    if cfg.use_prefix_kv and "layers_prefix.0.input_layernorm.weight" in sd:
        out["prefix"] = _stack([_llama_layer(sd, f"layers_prefix.{i}")
                                for i in range(cfg.num_layers)])
    return out


def _fold_weight_norm(sd: dict, name: str) -> dict:
    """Collapse weight-norm (weight_g/weight_v) to a plain conv weight, as the
    reference does at inference via remove_weight_norm (llm2tts.py:28-29)."""
    if f"{name}.weight" in sd:
        p = {"w": _t(sd[f"{name}.weight"])}
    else:
        g = _t(sd[f"{name}.weight_g"])
        v = _t(sd[f"{name}.weight_v"])
        norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        p = {"w": g * v / np.maximum(norm, 1e-12)}
    if f"{name}.bias" in sd:
        p["b"] = _t(sd[f"{name}.bias"])
    return p


def convert_codec(ckpt: dict, cfg: CodecConfig, with_encoder: bool = False) -> dict:
    gen_sd = ckpt["generator"]
    quant_sd = ckpt["quantizer"]
    nk = len(cfg.resblock_kernel_sizes)
    nd = len(cfg.resblock_dilation_sizes[0])

    def resblock(sd, b):
        return {
            "convs1": [_fold_weight_norm(sd, f"{b}.convs1.{j}") for j in range(nd)],
            "convs2": [_fold_weight_norm(sd, f"{b}.convs2.{j}") for j in range(nd)],
        }

    gen = {
        "conv_pre": _fold_weight_norm(gen_sd, "conv_pre"),
        "ups": [_fold_weight_norm(gen_sd, f"ups.{i}")
                for i in range(len(cfg.upsample_rates))],
        "resblocks": [resblock(gen_sd, f"resblocks.{i}")
                      for i in range(len(cfg.upsample_rates) * nk)],
        "conv_post": _fold_weight_norm(gen_sd, "conv_post"),
    }

    def q_modules(base: str):
        return [_t(quant_sd[f"{base}.{g}.embedding.weight"])
                for g in range(cfg.n_code_groups)]

    codebooks = [np.stack(q_modules("quantizer_modules"))]
    if cfg.residual_layers >= 2:
        codebooks.append(np.stack(q_modules("quantizer_modules2")))
    if cfg.residual_layers == 4:
        codebooks.append(np.stack(q_modules("quantizer_modules3")))
        codebooks.append(np.stack(q_modules("quantizer_modules4")))
    gst = np.stack([_t(quant_sd[f"quantizer_modules_globaltokens.{g}.embedding.weight"])
                    for g in range(cfg.global_code_num)])

    out = {"generator": gen,
           "quantizer": {"codebooks": codebooks, "gst": gst}}

    if with_encoder and "encoder" in ckpt:
        enc_sd = ckpt["encoder"]
        n_ups = len(cfg.upsample_rates)
        gns = []
        for i in range(n_ups):
            ch = 32 * (2 ** (i + 1))
            for j in range(nk):
                idx = i * nk + j
                gns.append({"scale": _t(enc_sd[f"normalize.{idx}.weight"]),
                            "bias": _t(enc_sd[f"normalize.{idx}.bias"])})
        gfc = cfg.global_feature_conv
        out["encoder"] = {
            "conv_pre": _fold_weight_norm(enc_sd, "conv_pre"),
            "ups": [_fold_weight_norm(enc_sd, f"ups.{i}") for i in range(n_ups)],
            "resblocks": [resblock(enc_sd, f"resblocks.{i}")
                          for i in range(n_ups * nk)],
            "group_norms": gns,
            "conv_post": _conv1d(enc_sd, "conv_post"),
            "gte": {
                "conv1": _conv1d(enc_sd, "GlobalTokenEncoder.conv.0"),
                "conv2": _conv1d(enc_sd, "GlobalTokenEncoder.conv.2"),
                "conv3": _conv1d(enc_sd, "GlobalTokenEncoder.conv.4"),
                "fn": _linear(enc_sd, "GlobalTokenEncoder.fn.0"),
                "bn": _bn(enc_sd, "GlobalTokenEncoder.fn.2"),
            },
        }
    return out


# ---------------------------------------------------------------------------
# orchestration + native save/load
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return sd


def save_native(path: str, params) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_native(path: str, like=None) -> dict:
    """Restore an orbax tree; `like` (an abstract/eager template) is optional
    — without it every leaf restores as host numpy. The numpy route is what
    makes checkpoints PORTABLE: orbax bakes the saving platform's shardings
    into the metadata, and a template-free StandardCheckpointer.restore
    replays them verbatim — a TPU-saved checkpoint then refuses to load in a
    CPU process ("Device TPU v5 lite0 was not found"). Host arrays feed jit
    on any backend, so callers need no device awareness."""
    import jax
    import numpy as _np
    import orbax.checkpoint as ocp

    if like is not None:
        return ocp.StandardCheckpointer().restore(path, like)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    tree = getattr(getattr(meta, "item_metadata", meta), "tree", None)
    if tree is None:  # older orbax layouts expose the tree directly
        tree = getattr(meta, "tree", meta)
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=_np.ndarray), tree)
    return ckptr.restore(path, restore_args=restore_args)
