"""Side-by-side execution against the reference's OWN PyTorch code.

VERDICT r4 #4: module math was parity-tested via hand-built HF oracles, but
the full WIRING (chat-prefix splice order, cache round-trip, state-head read
position, window/seam bookkeeping) had only been self-tested. These tests
import `/root/reference`'s actual classes — `AudioLLM.recognize` via
`inferencePipeline` (models/audioLLM.py:350-429, models/pipeline.py:36-88),
`ContextSerializer` (models/ContextSerializer.py), and `llm2TTS.run` /
`LLM2TTSCodecAR.infer` + `VQVAE` (models/decoder/llm2tts.py:114-160,
models/decoder/decoder.py:314-367) — drive them chunk-for-chunk against this
framework's stacks with SHARED weights (converted via utils/checkpoint), and
assert the trajectories match.

The reference needs shims to run here (documented, not behavioral):
- absent parent-project modules `shortuuid`, `logger.logger`, `librosa`
  (SURVEY.md §0.3) are stubbed;
- hard-coded `.to('cuda')` (transformer.py:279) / `.cuda()` (llm2tts.py:19-27)
  and `torch.autocast('cuda', ...)` are mapped to CPU no-ops;
- `.half()` (audioLLM.py:409) is a no-op so both stacks run f32 and the
  1e-4 trajectory tolerance is meaningful;
- `torch.compile` (audioLLM.py:245-288) is identity — same graphs, no
  compilation.
"""

import json
import logging
import os
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference"
ROLE = "You are a helpful voice assistant ."
CHAT_TEMPLATE = (
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    "<|im_start|>user\n<audio><|im_end|>\n<|im_start|>assistant\n")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_env():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not present")
    # --- stubs for modules the reference imports but does not ship ---
    import importlib.machinery

    def stub(name):
        m = types.ModuleType(name)
        # a real ModuleSpec: transformers probes importlib.util.find_spec
        # ('librosa'), which raises on a module whose __spec__ is None
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    short = stub("shortuuid")
    short.uuid = lambda: "refshim"
    logger_pkg = stub("logger")
    logger_mod = stub("logger.logger")
    logger_mod.setup_logger = lambda *a, **k: logging.getLogger("ref")
    logger_pkg.logger = logger_mod
    librosa = stub("librosa")  # vqvae_tester import-time only
    librosa.load = None
    sf = stub("soundfile")  # llm2tts import-time only
    sf.write = None
    sys.path.insert(0, REF)
    # --- CPU shims for the reference's CUDA-isms ---
    orig_to = torch.Tensor.to
    orig_half = torch.Tensor.half
    orig_compile = torch.compile
    orig_cuda_t = torch.Tensor.cuda
    orig_cuda_m = torch.nn.Module.cuda
    orig_autocast = torch.autocast

    def to_cpu_safe(self, *a, **k):
        if a and a[0] == "cuda" and not torch.cuda.is_available():
            return self
        return orig_to(self, *a, **k)

    class _NullAutocast:
        def __init__(self, device_type=None, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    torch.Tensor.to = to_cpu_safe
    torch.Tensor.half = lambda self: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.compile = lambda m=None, **k: m
    torch.autocast = _NullAutocast
    yield
    torch.Tensor.to = orig_to
    torch.Tensor.half = orig_half
    torch.Tensor.cuda = orig_cuda_t
    torch.nn.Module.cuda = orig_cuda_m
    torch.compile = orig_compile
    torch.autocast = orig_autocast
    sys.path.remove(REF)


@pytest.fixture(scope="module")
def ckpt_dir(ref_env, tmp_path_factory):
    """Reference-format checkpoint dir shared by both stacks: the synthetic
    audiollm/LLM fixtures from test_full_checkpoint_e2e, plus a REAL loadable
    tokenizer (so the chat-prefix ids are identical on both sides) and the
    chat_template the fork's train.yaml would carry."""
    import yaml

    from tests.test_full_checkpoint_e2e import (_make_audiollm_ckpt,
                                                _make_codec_ckpt,
                                                _make_decoder_ckpt,
                                                _make_hf_llm)

    tmp = tmp_path_factory.mktemp("refck")
    _make_audiollm_ckpt(tmp)
    _make_hf_llm(tmp)
    _make_decoder_ckpt(tmp)  # build_system_from_reference loads all four
    _make_codec_ckpt(tmp)

    # WordLevel tokenizer with the chat specials as added tokens: both
    # stacks tokenize the SAME template strings to the SAME ids, and
    # ids('<|im_end|>') + ids(x) == ids('<|im_end|>' + x) (the reference
    # builds the user prefix by concatenation, audioLLM.py:295-296)
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"[UNK]": 0, "system": 1, "user": 2, "assistant": 3, "You": 4,
             "are": 5, "a": 6, "helpful": 7, "voice": 8, ".": 9}
    t = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    t.pre_tokenizer = Whitespace()
    t.add_special_tokens(["<|im_start|>", "<|im_end|>"])
    t.save(str(tmp / "llm" / "tokenizer.json"))
    with open(tmp / "llm" / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "<|im_end|>"}, f)

    p = tmp / "audiollm" / "train.yaml"
    doc = yaml.safe_load(p.read_text())
    doc["model_conf"]["chat_template"] = CHAT_TEMPLATE
    p.write_text(yaml.dump(doc))
    return tmp


def _load_ref_pipeline(ckpt_dir):
    import models.pipeline as ref_pipeline

    return ref_pipeline.inferencePipeline(
        {"model_path": str(ckpt_dir), "llm_path": str(ckpt_dir / "llm"),
         "device": "cpu"})


def _load_ours(ckpt_dir):
    from freeze_omni_tpu.pipeline import DuplexPipeline
    from freeze_omni_tpu.utils.factory import build_system_from_reference

    cfg, params, _tts, tok = build_system_from_reference(
        str(ckpt_dir), str(ckpt_dir / "llm"))
    return DuplexPipeline(cfg, params=params, tokenizer=tok)


class TestDialogStateParity:
    def test_dual_identity_trajectory(self, ref_env, ckpt_dir):
        """20 duplex chunks (user + gated system, shared KV, per-identity
        caches — the llm_prefill wiring of bin/dialog_state_pred.py:792-814)
        through BOTH stacks: every user-chunk state-probability pair must
        match to 1e-4."""
        ref = _load_ref_pipeline(ckpt_dir)

        # the checkpoint must have FULLY loaded into the reference modules:
        # load_state_dict(strict=False) silently drops misnamed keys, which
        # would leave the reference running random init and void the parity
        sd = torch.load(ckpt_dir / "audiollm" / "final.pt",
                        weights_only=True)
        res = ref.model.load_state_dict(sd, strict=False)
        assert not res.unexpected_keys, res.unexpected_keys

        ours = _load_ours(ckpt_dir)

        # 'pre': system-role prefill
        with torch.no_grad():
            ref_kv = ref.model.set_system_role(
                {"role_prompt": "<|im_start|>system\n" + ROLE})
        _, our_kv, _, _, _ = ours.speech_dialogue(None, "user", "pre",
                                                  role=ROLE)

        rng = np.random.RandomState(0)
        T = 16
        schedule = [("user", "ipu_sl"), ("user", "ipu_cl"),
                    ("user", "ipu_cl"), ("user", "ipu_el"),
                    ("system", "ipu_sl"), ("system", "ipu_cl"),
                    ("system", "ipu_cl"),
                    ("user", "ipu_sl"), ("user", "ipu_cl"),
                    ("system", "ipu_sl"),
                    ("user", "ipu_cl"), ("user", "ipu_el"),
                    ("system", "ipu_sl"), ("system", "ipu_cl"),
                    ("user", "ipu_sl"), ("user", "ipu_cl"),
                    ("user", "ipu_cl"), ("user", "ipu_el"),
                    ("system", "ipu_sl"), ("user", "ipu_sl")]
        ref_c = {i: {"encoder_cache": None, "adapter_cache": None,
                     "pe_index": 0} for i in ("user", "system")}
        our_c = {i: {"encoder_cache": None, "adapter_cache": None,
                     "pe_index": 0} for i in ("user", "system")}

        n_checked = 0
        for step, (ident, status) in enumerate(schedule):
            chunk = (rng.randn(1, T, 80) * 0.5).astype(np.float32)
            with torch.no_grad():
                probs, ref_kv, ac, ec, pe = ref.model.recognize(
                    torch.tensor(chunk),
                    {"identity": ident, "status": status,
                     "past_key_values": ref_kv, **ref_c[ident]})
            ref_c[ident] = {"encoder_cache": ec, "adapter_cache": ac,
                            "pe_index": pe}
            c = our_c[ident]
            pred, our_kv, adp, enc, pe2 = ours.speech_dialogue(
                chunk, ident, status, past_key_values=our_kv,
                adapter_cache=c["adapter_cache"],
                encoder_cache=c["encoder_cache"], pe_index=c["pe_index"])
            our_c[ident] = {"encoder_cache": enc, "adapter_cache": adp,
                            "pe_index": pe2}
            if ident == "user":
                assert probs is not None and pred is not None, step
                for k in ("state_1", "state_2"):
                    assert abs(pred[k] - probs[k]) < 1e-4, (
                        step, k, pred[k], probs[k])
                n_checked += 1
            else:
                assert probs is None and pred is None, step
        assert n_checked >= 10

        # shared-context proof: the KV lengths agree at every point by
        # construction (same splice arithmetic); check the final one
        ref_len = ref_kv[0][0].shape[2]
        our_len = int(np.asarray(our_kv.length)[0])
        assert ref_len == our_len, (ref_len, our_len)


class TestSerializerParity:
    def test_gating_trajectory_matches(self, ref_env):
        from models.ContextSerializer import ContextSerializer as RefSer

        from freeze_omni_tpu.duplex.serializer import ContextSerializer

        ref, ours = RefSer(), ContextSerializer()
        rng = np.random.RandomState(1)
        # interleaved user/system streams with overlap: user IPUs must mute
        # system chunks; the first system chunk after a user IPU must force
        # ipu_sl (the chat-prefix insertion trigger)
        stream = []
        t = 0.0
        for u_status in ("ipu_sl", "ipu_cl", "ipu_cl", "ipu_el", None,
                         "ipu_sl", "ipu_cl", "ipu_el", None, None):
            t += 0.224
            if u_status is not None:
                stream.append({"time_stamp": t, "identity": "user",
                               "status": u_status, "feature": None,
                               "ipu_id": 1})
            stream.append({"time_stamp": t + 0.01, "identity": "system",
                           "status": "ipu_cl", "feature": None,
                           "ipu_id": 2})
        rng.shuffle(stream)  # arrival order != timestamp order
        got_ref, got_ours = [], []
        for ch in sorted(stream, key=lambda c: c["time_stamp"]):
            ref.add_feature_chunk(dict(ch))
            ours.add_feature_chunk(dict(ch))
            r = ref.get_next_feature()
            o = ours.get_next_feature()
            got_ref.append(None if r is None else
                           (r["identity"], r["status"], r["time_stamp"]))
            got_ours.append(None if o is None else
                            (o["identity"], o["status"], o["time_stamp"]))
        assert got_ref == got_ours
        assert any(g is not None and g[0] == "system" and g[1] == "ipu_sl"
                   for g in got_ref)  # the force-sl rule actually fired


class _TupleLayer(torch.nn.Module):
    """Transformers-version compat: the reference indexes
    `layer_outputs[0]` / `[1]` (decoder.py:143-153, 177-187, 301-310) from
    an era when LlamaDecoderLayer returned a tuple; current transformers
    returns the hidden-states tensor and updates the DynamicCache in place.
    Restore the tuple so the reference code runs unmodified."""

    def __init__(self, layer):
        super().__init__()
        self.layer = layer

    def forward(self, *a, **k):
        out = self.layer(*a, **k)
        if isinstance(out, torch.Tensor):
            return out, k.get("past_key_value")
        return out


def _force_eager_attention(dec) -> None:
    """The reference builds raw LlamaDecoderLayers from a bare LlamaConfig
    (decoder.py:77-81) — current transformers only resolves the attention
    backend when the config passed through PreTrainedModel init; force the
    eager path (mathematically the same attention). Also wrap every layer in
    the tuple-compat shim (call AFTER loading the state dict)."""
    dec.layers[0].self_attn.config._attn_implementation = "eager"
    for name in ("layers", "layers_prefix", "layers_pre_nn"):
        mod = getattr(dec, name, None)
        if mod is not None and not isinstance(mod[0], _TupleLayer):
            setattr(dec, name,
                    torch.nn.ModuleList([_TupleLayer(l) for l in mod]))


def _make_ref_tts_ckpt(tmp):
    """Decoder + codec checkpoints extracted from the REFERENCE's own
    modules (LLM2TTSCodecAR / Generator / Quantizer / Encoder state dicts,
    weight_norm params and all) — stronger conversion evidence than the
    hand-named fixtures."""
    from models.decoder.decoder import LLM2TTSCodecAR
    from models.decoder.ticodec.models import Encoder, Generator, Quantizer
    from models.decoder.ticodec.vqvae import AttrDict

    import argparse

    idim, odim = 32, 32
    args = argparse.Namespace(
        idim=idim, odim=odim, encoder_pre_norm_type="ln",
        encoder_drop_rate=0.0, encoder_criterion="cross-entropy",
        encoder_upsample_rate=1, kv_cache_prefix_finetune=1,
        encoder_output_dim=idim,
        transformer_attention_dim=idim, transformer_num_blocks=2,
        transformer_attention_heads=4, transformer_linear_units=64,
        transformer_dropout_rate=0.0)
    torch.manual_seed(3)
    dec = LLM2TTSCodecAR(idim, odim, args)  # weights only; no shims here —
    # (they would rename sd keys). Random weights can argmax a SPECIAL token
    # (bos/sos/pad >= odim), which the codec embedding cannot take — a
    # trained decoder only emits codec ids + eos; bias the specials away so
    # the greedy stream stays in-vocabulary on both stacks.
    with torch.no_grad():
        dec.out_fnn.bias[odim:] = -30.0
    os.makedirs(tmp / "decoder", exist_ok=True)
    torch.save(dec.state_dict(), tmp / "decoder" / "final.pt")
    (tmp / "decoder" / "model.json").write_text(json.dumps(
        [idim, odim, vars(args)]))

    h = AttrDict({
        "resblock": "1", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]],
        "upsample_rates": [8, 5, 5, 3],
        "upsample_kernel_sizes": [16, 10, 10, 6],
        # 256 -> channel ladder 128,64,32,16: the GST injection fires at the
        # 128-channel stage (models.py:236-237), exercising that wiring
        "upsample_initial_channel": 256,
        "n_codes": 32, "n_code_groups": 1, "residul_layer": 1,
        "global_code_num": 2, "codebook_loss_lambda": 1.0,
        "commitment_loss_lambda": 0.25,
        "global_feature_conv": [512, 64, 128, 3, 1],
        "global_tokens": [3, 7]})
    torch.manual_seed(4)
    gen, quant, enc = Generator(h), Quantizer(h), Encoder(h)
    os.makedirs(tmp / "codec", exist_ok=True)
    torch.save({"generator": gen.state_dict(),
                "quantizer": quant.state_dict(),
                "encoder": enc.state_dict()}, tmp / "codec" / "final.pt")
    (tmp / "codec" / "model.json").write_text(json.dumps(dict(h)))
    return h


class TestSpeechSynthesisParity:
    def test_llm2tts_run_matches_streaming_tts(self, ref_env, ckpt_dir,
                                               tmp_path_factory):
        """Greedy (top_k=1, no penalty): the reference llm2TTS.run generator
        (AR decode -> 40+10 token windows -> VQVAE -> trim -> min-sum seam
        splice) and our StreamingTTS.run must yield the same PCM stream."""
        import dataclasses

        tmp = tmp_path_factory.mktemp("reftts")
        _make_ref_tts_ckpt(tmp)

        from models.decoder.llm2tts import llm2TTS

        ref_tts = llm2TTS(str(tmp))
        _force_eager_attention(ref_tts.model)

        from freeze_omni_tpu.tts import StreamingTTS
        from freeze_omni_tpu.utils import factory

        dcfg, dec_params = factory.load_speech_decoder(str(tmp))
        ccfg, codec_params = factory.load_codec(str(tmp))
        tts_cfg = dataclasses.replace(
            _tiny_tts_cfg(dcfg, ccfg), top_k=1, penalty_window_size=0,
            seam_window=2401, seam_threshold=0.01, max_tokens=1000)
        ours = StreamingTTS({"decoder": dec_params, "codec": codec_params},
                            tts_cfg, seed=0)

        rng = np.random.RandomState(5)
        hidden = (rng.randn(1, 7, dcfg.idim) * 0.5).astype(np.float32)
        prefix = (rng.randn(1, 3, dcfg.idim) * 0.5).astype(np.float32)

        with torch.no_grad():
            ref_segs = [np.asarray(s, np.float32) for s in ref_tts.run(
                torch.tensor(hidden), 1, torch.tensor(prefix),
                codec_chunk_size=40, codec_padding_size=10,
                penalty_window_size=-1)]
        our_segs = list(ours.run(hidden, prefix=prefix, top_k=1))

        ref_pcm = np.concatenate(ref_segs, axis=-1)
        our_pcm = np.concatenate(our_segs, axis=-1)
        assert ref_pcm.shape == our_pcm.shape, (ref_pcm.shape, our_pcm.shape)
        np.testing.assert_allclose(our_pcm, ref_pcm, atol=1e-4, rtol=1e-3)


def _tiny_tts_cfg(dcfg, ccfg):
    from freeze_omni_tpu.config import TTSConfig

    return TTSConfig(decoder=dcfg, codec=ccfg, codec_chunk_size=40,
                     codec_padding_size=10)
