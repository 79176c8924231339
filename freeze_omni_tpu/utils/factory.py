"""Model factory: build pipelines from reference checkpoint directories.

Parity with models/utils.init_encoder_llm + load_checkpoint and the loaders in
models/pipeline.py:11-34 and models/decoder/llm2tts.py:17-68: reads
`<model_path>/audiollm/train.yaml` + `global_cmvn` + `final.pt`, the HF LLM at
`llm_path`, `<model_path>/decoder/{model.json,final.pt}` and
`<model_path>/codec/{model.json,final.pt}`, converts everything into this
framework's pytrees, and reports shape mismatches instead of failing
(strict=False semantics, models/utils.py:11-28).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from ..config import (AudioLLMConfig, CodecConfig, SpeechDecoderConfig,
                      SystemConfig, assign_from_dict, flagship_system,
                      from_reference_train_yaml)
from . import checkpoint as ckpt


def _report_mismatches(converted: dict, template: dict, name: str) -> None:
    import jax

    def chk(path, a, b):
        if hasattr(a, "shape") and hasattr(b, "shape") and a.shape != b.shape:
            print(f"[{name}] shape mismatch at {path}: ckpt {a.shape} vs "
                  f"model {b.shape}")

    try:
        jax.tree.map(lambda a, b: chk("", a, b), converted, template)
    except Exception as e:  # structure mismatch: report, keep going
        print(f"[{name}] structure differs from init template: {e}")


def load_audiollm(model_path: str, cfg: Optional[AudioLLMConfig] = None
                  ) -> Tuple[AudioLLMConfig, dict]:
    """-> (config from train.yaml, converted audiollm params with CMVN)."""
    import yaml

    with open(os.path.join(model_path, "audiollm", "train.yaml")) as f:
        configs = yaml.safe_load(f)
    if cfg is None:
        cfg = from_reference_train_yaml(configs)

    sd = ckpt.load_torch_state_dict(
        os.path.join(model_path, "audiollm", "final.pt"))
    params = ckpt.convert_audiollm(sd, cfg)

    cmvn_path = os.path.join(model_path, "audiollm", "global_cmvn")
    if os.path.exists(cmvn_path):
        from ..frontend.cmvn import load_cmvn

        mean, istd = load_cmvn(cmvn_path, configs.get("is_json_cmvn", True))
        for who in ("encoder_user", "encoder_system"):
            # the stats file only SEEDS the normalizer: when final.pt carries
            # the global_cmvn buffers, those win — matching the reference's
            # load order (init from file, then strict=False state-dict load
            # overwrites; models/utils.py:11-28 after init_encoder_llm)
            params[who].setdefault("cmvn", {"mean": mean, "istd": istd})
    return cfg, params


def load_llm(llm_path: str, cfg: AudioLLMConfig):
    """HF Qwen2 weights (audioLLM.py:70-74) -> (LLMConfig from the HF config,
    backbone pytree). The HF config is authoritative for the backbone shape."""
    import dataclasses

    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(llm_path, trust_remote_code=True,
                                              dtype="auto")
    h = hf.config
    llm_cfg = dataclasses.replace(
        cfg.llm,
        hidden=h.hidden_size, num_layers=h.num_hidden_layers,
        num_heads=h.num_attention_heads, num_kv_heads=h.num_key_value_heads,
        ffn=h.intermediate_size, vocab_size=h.vocab_size,
        rope_theta=getattr(h, "rope_theta", cfg.llm.rope_theta),
        rms_eps=getattr(h, "rms_norm_eps", cfg.llm.rms_eps),
        tie_embeddings=bool(getattr(h, "tie_word_embeddings", False)))
    return llm_cfg, ckpt.convert_hf_qwen2(hf.state_dict(), llm_cfg)


def load_speech_decoder(model_path: str,
                        cfg: Optional[SpeechDecoderConfig] = None
                        ) -> Tuple[SpeechDecoderConfig, dict]:
    """decoder/model.json is [idim, odim, args] (llm2tts.py:32-39)."""
    with open(os.path.join(model_path, "decoder", "model.json")) as f:
        idim, odim, args = json.load(f)
    if cfg is None:
        cfg = SpeechDecoderConfig(
            idim=idim, hidden=args.get("transformer_attention_dim", idim),
            num_layers=args.get("transformer_num_blocks", 4),
            num_heads=args.get("transformer_attention_heads", 14),
            ffn=args.get("transformer_linear_units", 4864),
            codec_vocab=odim,
            use_prefix_kv=bool(args.get("kv_cache_prefix_finetune", 0)),
        )
    sd = ckpt.load_torch_state_dict(
        os.path.join(model_path, "decoder", "final.pt"))
    return cfg, ckpt.convert_speech_decoder(sd, cfg)


def load_codec(model_path: str, cfg: Optional[CodecConfig] = None
               ) -> Tuple[CodecConfig, dict]:
    with open(os.path.join(model_path, "codec", "model.json")) as f:
        h = json.load(f)
    if cfg is None:
        # map the reference's key spellings onto the typed config
        if "residul_layer" in h:  # sic (models.py:548)
            h = {**h, "residual_layers": h["residul_layer"]}
        for k in ("upsample_rates", "upsample_kernel_sizes",
                  "resblock_kernel_sizes"):
            if k in h:
                h[k] = tuple(h[k])
        if "resblock_dilation_sizes" in h:
            h["resblock_dilation_sizes"] = tuple(
                tuple(d) for d in h["resblock_dilation_sizes"])
        cfg = assign_from_dict(CodecConfig(), h)
        if "global_tokens" in h:
            cfg = assign_from_dict(cfg, {"global_tokens": tuple(h["global_tokens"])})
    torch_ckpt = ckpt.load_torch_state_dict(
        os.path.join(model_path, "codec", "final.pt"))
    return cfg, ckpt.convert_codec(torch_ckpt, cfg,
                                   with_encoder="encoder" in torch_ckpt)


def load_tokenizer(llm_path: str, vocab_size: int):
    """Real-weight runs need the real Qwen2 BPE tokenizer (audioLLM.py:73-74);
    the ByteTokenizer fallback only makes sense for weightless/synthetic runs
    (its decode drops ids >= 256, so real generations would come out empty)."""
    from .tokenizer import ByteTokenizer, HFTokenizer

    try:
        return HFTokenizer(llm_path)
    except Exception as e:
        print(f"[tokenizer] no usable HF tokenizer at {llm_path} ({e!r}); "
              "falling back to ByteTokenizer (synthetic-weights mode)")
        return ByteTokenizer(vocab_size)


def build_system_from_reference(model_path: str, llm_path: str, *,
                                quantize_llm_bits: Optional[int] = None
                                ) -> Tuple[SystemConfig, dict, dict, object]:
    """Full parity loader: returns (system config, audio_llm params incl. LLM,
    tts params {'decoder','codec'}, tokenizer).

    quantize_llm_bits: 8 (or 4) quantizes the frozen backbone weight-only ON
    THE HOST CPU before it ever reaches the accelerator — the bf16 7B is
    13.2 GiB, which cannot coexist with its quantized copy (or a KV cache)
    on one 16 GB chip. Serving the real 28-layer model single-chip requires
    int8 (7.1 GiB resident; bench-validated at 93 tok/s decode)."""
    import dataclasses

    import jax

    acfg, audiollm = load_audiollm(model_path)
    cpu = jax.local_devices(backend="cpu")[0]
    if quantize_llm_bits:
        # keep the bf16 tree + quantization math off the accelerator
        with jax.default_device(cpu):
            llm_cfg, llm_params = load_llm(llm_path, acfg)
            from ..ops.quant import quantize_llm_params

            llm_params = quantize_llm_params(llm_params,
                                             bits=quantize_llm_bits)
        audiollm["llm"] = jax.device_put(
            llm_params, jax.devices()[0]) if jax.devices()[0] != cpu \
            else llm_params
    else:
        llm_cfg, audiollm["llm"] = load_llm(llm_path, acfg)
    acfg = dataclasses.replace(acfg, llm=llm_cfg)
    dcfg, dec = load_speech_decoder(model_path)
    ccfg, codec = load_codec(model_path)

    base = flagship_system()
    cfg = dataclasses.replace(
        base, audio_llm=acfg,
        tts=dataclasses.replace(base.tts, decoder=dcfg, codec=ccfg))
    tokenizer = load_tokenizer(llm_path, llm_cfg.vocab_size)
    return cfg, audiollm, {"decoder": dec, "codec": codec}, tokenizer


_TOKENIZER_FILES = ("tokenizer.json", "tokenizer_config.json", "vocab.json",
                    "merges.txt", "special_tokens_map.json",
                    "added_tokens.json", "chat_template.jinja")


def save_native_system(out_dir: str, cfg: SystemConfig, audiollm: dict,
                       tts: dict, llm_path: Optional[str] = None) -> None:
    """Persist a converted (optionally quantized) system as a NATIVE
    checkpoint: orbax params + a json config (our YAML schema — json is
    valid YAML, so config.load_system_config reads it back directly) + a copy
    of the HF tokenizer files, so the checkpoint serves on hosts where the
    original HF dir is absent. Restarting from this skips the torch load +
    quantization entirely."""
    import dataclasses
    import json
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    ckpt.save_native(os.path.join(os.path.abspath(out_dir), "params"),
                     {"audiollm": audiollm, "tts": tts})
    if llm_path and os.path.isdir(llm_path):
        tok_dir = os.path.join(out_dir, "tokenizer")
        os.makedirs(tok_dir, exist_ok=True)
        for name in _TOKENIZER_FILES:
            src = os.path.join(llm_path, name)
            if os.path.isfile(src):
                shutil.copy2(src, os.path.join(tok_dir, name))
    doc = dataclasses.asdict(cfg)
    doc["_native_system"] = True
    doc["_llm_path"] = llm_path  # provenance; tokenizer/ is preferred at load
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(doc, f)


def is_native_system(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "config.json")) and \
        os.path.isdir(os.path.join(path, "params"))


def load_native_system(path: str, *, allow_byte_tokenizer: bool = False
                       ) -> Tuple[SystemConfig, dict, dict, object]:
    """Load a save_native_system dir: returns the same 4-tuple as
    build_system_from_reference.

    Prefers the tokenizer files copied into `<path>/tokenizer` at convert
    time; falls back to the recorded HF dir. A real-vocab config that ends
    up on the ByteTokenizer fallback (decode drops ids >= 256 — generations
    would silently come out empty) is a hard error unless
    allow_byte_tokenizer is set (synthetic-weights runs)."""
    import json

    from ..config import load_system_config

    cfg = load_system_config(os.path.join(path, "config.json"))
    with open(os.path.join(path, "config.json")) as f:
        doc = json.load(f)
    params = ckpt.load_native(os.path.join(os.path.abspath(path), "params"))
    vocab = cfg.audio_llm.llm.vocab_size
    local_tok = os.path.join(path, "tokenizer")
    tok_path = local_tok if os.path.isdir(local_tok) \
        else (doc.get("_llm_path") or "")
    tokenizer = load_tokenizer(tok_path, vocab)
    from .tokenizer import ByteTokenizer

    if isinstance(tokenizer, ByteTokenizer) and vocab > 4096 \
            and not allow_byte_tokenizer:
        raise RuntimeError(
            f"native checkpoint at {path} has vocab_size={vocab} but no "
            "usable tokenizer (no tokenizer/ copy in the checkpoint and no "
            f"HF dir at {doc.get('_llm_path')!r}). Serving with the "
            "ByteTokenizer fallback would emit empty text. Re-run "
            "bin/convert_ckpt.py with --llm pointing at the HF dir, or pass "
            "allow_byte_tokenizer=True for synthetic runs.")
    return cfg, params["audiollm"], params["tts"], tokenizer
