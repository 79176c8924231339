"""Typed configuration tree for the Freeze-Omni TPU stack.

The reference scatters configuration across argparse namespaces poured from YAML
(models/encoder/encoder.py:36-43), JSON-as-Namespace (models/decoder/llm2tts.py:32-47)
and a flat app YAML (configs/dialog_state_pred_config.yaml). Here the whole system is
described by one immutable dataclass tree; every sub-config is hashable so it can be
used as a static argument to jitted step functions.

Dimension defaults marked "(ckpt cfg)" live in external checkpoint configs in the
reference (SURVEY.md §0); the values below are faithful to the published Freeze-Omni
architecture and are overridable from YAML / reference train.yaml via
`from_reference_train_yaml`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


# ---------------------------------------------------------------------------
# Audio frontend
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FbankConfig:
    """Kaldi-compatible log-mel filterbank parameters.

    Mirrors torchaudio.compliance.kaldi.fbank defaults as invoked by the
    reference (bin/inference.py:77-78 and models/AudioFeatureGating.py:65-69).
    """

    sample_rate: int = 16000
    num_mel_bins: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    dither: float = 0.0
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"  # (0.5 - 0.5 cos)^0.85
    round_to_power_of_two: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 means nyquist + high_freq
    snip_edges: bool = True
    use_power: bool = True

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def padded_window_size(self) -> int:
        n = self.frame_length
        if not self.round_to_power_of_two:
            return n
        p = 1
        while p < n:
            p *= 2
        return p


@dataclass(frozen=True)
class ChunkerConfig:
    """Offline streaming chunker (bin/inference.py:43-52 semantics)."""

    chunk_size: int = 16  # fbank frames per chunk
    chunk_overlap: int = 3  # left-context frames carried over
    feat_dim: int = 80
    frame_size: int = 400
    frame_shift: int = 160

    @property
    def samples_per_chunk(self) -> int:
        return self.frame_shift * self.chunk_size

    @property
    def frames_per_step(self) -> int:
        return self.chunk_size + self.chunk_overlap


@dataclass(frozen=True)
class GatingConfig:
    """Duplex fbank gating timing (models/AudioFeatureGating.py:9-45)."""

    sample_rate: int = 16000
    feat_dim: int = 80
    chunk_duration_s: float = 0.224
    frame_length_s: float = 0.016
    frame_shift_s: float = 0.008
    context_duration_s: float = 0.032
    history_size: int = 10
    onset_cache_size: int = 6

    @property
    def steps_per_chunk(self) -> int:
        return int(round(self.chunk_duration_s / self.frame_shift_s))

    @property
    def context_steps(self) -> int:
        return int(round(self.context_duration_s / self.frame_shift_s))

    @property
    def samples_per_chunk(self) -> int:
        return int(self.frame_shift_s * self.sample_rate) * self.steps_per_chunk

    @property
    def frames_per_step(self) -> int:
        return self.steps_per_chunk + self.context_steps

    def fbank(self) -> FbankConfig:
        return FbankConfig(
            sample_rate=self.sample_rate,
            num_mel_bins=self.feat_dim,
            frame_length_ms=self.frame_length_s * 1000.0,
            frame_shift_ms=self.frame_shift_s * 1000.0,
        )


# ---------------------------------------------------------------------------
# Speech encoder / adapter
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EncoderConfig:
    """Chunk-streaming transformer encoder (models/encoder/*).

    Defaults follow the wenet-style config used by Freeze-Omni (ckpt cfg):
    Conv2dSubsampling4 into a pre-LN transformer with relative positional
    encoding and a sliding attention window of chunk_size*left_chunks keys.
    """

    input_dim: int = 80
    output_dim: int = 512
    attention_dim: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 16
    chunk_size: int = 4  # in post-subsampling frames
    left_chunks: int = 16
    pos_enc: str = "rel-enc"  # "rel-enc" | "abs-enc"
    input_layer: str = "linear"
    positionwise: str = "linear"  # "linear" | "conv1d-linear"
    positionwise_conv_kernel: int = 1
    normalize_before: bool = True
    concat_after: bool = False
    pe_max_len: int = 5000
    subsampling_rate: int = 4

    def __post_init__(self):
        if self.pos_enc not in ("rel-enc", "abs-enc"):
            raise ValueError(
                f"unsupported pos_enc {self.pos_enc!r}: the reference encoder "
                "supports 'rel-enc' (RelPositionalEncoding) and 'abs-enc' "
                "(PositionalEncoding) only (models/encoder/transformer.py:179-184)")

    @property
    def head_dim(self) -> int:
        return self.attention_dim // self.attention_heads

    @property
    def window(self) -> int:
        """Number of cached keys retained between streaming steps."""
        return self.chunk_size * self.left_chunks

    @property
    def full_chunk_size(self) -> int:
        return (self.left_chunks + 1) * self.chunk_size

    @property
    def pe_wrap(self) -> int:
        """Streaming PE wraps at this many frames (attention.py:88,107)."""
        return self.chunk_size * (self.pe_max_len // self.chunk_size) - self.full_chunk_size


@dataclass(frozen=True)
class AdapterConfig:
    """CNN subsampling adapter, encoder dim -> LLM dim (models/adapter.py:72-157)."""

    enc_out_dim: int = 512
    llm_dim: int = 3584
    kernel_size: int = 5
    activation: str = "relu"  # "relu" | "gelu"
    norm: str = "batch"  # "batch" | "layer"

    @property
    def two_stage(self) -> bool:
        # reference: 2 conv stages iff enc_out_dim * 4 < llm_dim (adapter.py:84)
        return self.enc_out_dim * 4 < self.llm_dim


# ---------------------------------------------------------------------------
# LLM backbone (Qwen2-style)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LLMConfig:
    """Qwen2-7B-Instruct-compatible decoder-only backbone."""

    hidden: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    ffn: int = 18944
    vocab_size: int = 152064
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    max_kv_len: int = 2048
    tie_embeddings: bool = False
    qkv_bias: bool = True  # Qwen2 uses bias on q/k/v projections

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads


@dataclass(frozen=True)
class AudioLLMConfig:
    """AudioLLM = dual streaming encoders + adapters + frozen LLM + state head
    (models/audioLLM.py:25-233)."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    adapter: AdapterConfig = field(default_factory=AdapterConfig)
    llm: LLMConfig = field(default_factory=LLMConfig)
    num_states: int = 4  # predictor head classes (audioLLM.py:215)
    # task/prompt/prefix-tuning tables (audioLLM.py:169-195; training-time
    # conditioning — the fork's inference path never reads them, but converted
    # checkpoints carry them)
    task_num: int = 10
    prompt_finetune: bool = False
    prompt_num: int = 5
    prefix_finetune: bool = False
    prefix_num: int = 5


# ---------------------------------------------------------------------------
# Speech decoder + codec
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SpeechDecoderConfig:
    """AR single-codebook speech-token decoder, LLaMA-architecture
    (models/decoder/decoder.py:60-119). Dims are (ckpt cfg)."""

    idim: int = 896  # embedding dim == hidden (LLM hidden 3584 viewed as 4x896)
    hidden: int = 896
    num_layers: int = 4
    num_heads: int = 14
    ffn: int = 4864
    codec_vocab: int = 1024  # odim; specials occupy [vocab, vocab+3]
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    max_kv_len: int = 2048
    use_prefix_kv: bool = True  # kv_cache_prefix_finetune

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads

    @property
    def full_vocab(self) -> int:
        return self.codec_vocab + 4

    @property
    def bos_id(self) -> int:
        return self.codec_vocab

    @property
    def sos_id(self) -> int:
        return self.codec_vocab + 1

    @property
    def eos_id(self) -> int:
        return self.codec_vocab + 2

    @property
    def pad_id(self) -> int:
        return self.codec_vocab + 3

    @property
    def num_pre_nn_layers(self) -> int:
        return self.num_layers // 2


@dataclass(frozen=True)
class CodecConfig:
    """TiCodec VQ-VAE (models/decoder/ticodec/models.py). Dims are (ckpt cfg)."""

    sample_rate: int = 24000
    # 4 stages (product 600 = 24kHz / 40Hz): the reference encoder's hardcoded
    # 32->512 channel ladder and 512-dim codebooks imply exactly 4 stages
    # (models.py:440-464)
    upsample_rates: Tuple[int, ...] = (8, 5, 5, 3)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 10, 10, 6)
    upsample_initial_channel: int = 512
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    n_codes: int = 1024
    n_code_groups: int = 1
    residual_layers: int = 1
    global_code_num: int = 8
    global_feature_dim: int = 128
    # in/hidden/out/kernel/stride; `in` must equal the encoder's mid-stage
    # channel count 32 * 2**(num_upsamples//2) (models.py:490-492)
    global_feature_conv: Tuple[int, ...] = (128, 128, 128, 3, 1)
    global_tokens: Tuple[int, ...] = (0,) * 8  # default style tokens (ckpt cfg)

    @property
    def upsample_rate(self) -> int:
        r = 1
        for u in self.upsample_rates:
            r *= u
        return r


@dataclass(frozen=True)
class TTSConfig:
    """Streaming synthesis (models/decoder/llm2tts.py:114-160)."""

    decoder: SpeechDecoderConfig = field(default_factory=SpeechDecoderConfig)
    codec: CodecConfig = field(default_factory=CodecConfig)
    codec_chunk_size: int = 40
    codec_padding_size: int = 10
    top_k: int = 2
    penalty_window_size: int = -1
    penalty: float = 1.1
    max_tokens: int = 1000
    seam_window: int = 2401  # find_min_sum_index N
    seam_threshold: float = 0.01


# ---------------------------------------------------------------------------
# Duplex / VAD / serving
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VADConfig:
    """Streaming VAD contract of the absent periphrals.PureVAD
    (bin/dialog_state_pred.py:134, 477)."""

    sample_rate: int = 16000
    chunk_size: int = 512  # samples per VAD step
    threshold: float = 0.5
    min_silence_s: float = 0.5
    speech_pad_s: float = 0.03
    # sustained speech required to OPEN an IPU (silero's min_speech_duration
    # role): brief excursions — babble spikes, clicks — must not trigger.
    # Expressed in SECONDS because the chunk size varies by deployment
    # (512 samples standalone, 224 ms in the duplex engine, where one chunk
    # already averages ~28 frames and debounces intrinsically). The onset is
    # retroactive: pending chunks replay from the history ring on confirm,
    # so no audio is lost, only the decision is debounced.
    min_speech_s: float = 0.128
    # must cover the debounce window + speech pad so the replay reaches
    # back to the true onset
    history_cache_chunks: int = 6
    # 'learned' = log-mel GRU (assets/vad.npz, trained by training/vad.py,
    # the silero-vad role); 'energy' = adaptive-noise-floor fallback
    kind: str = "learned"
    # the system identity hears our own synthesized speech: an energy gate is
    # sufficient there and robust to codec artifacts
    system_kind: str = "energy"
    weights: Optional[str] = None  # None -> packaged assets/vad.npz


@dataclass(frozen=True)
class SamplingConfig:
    top_k: int = 5
    top_p: float = 0.8
    temperature: float = 0.7


@dataclass(frozen=True)
class DuplexConfig:
    vad: VADConfig = field(default_factory=VADConfig)
    gating: GatingConfig = field(default_factory=GatingConfig)
    resp_threshold: float = 0.5
    default_prompt: str = (
        "Start new response if the user provided new information or gave new instructions."
    )
    # multi-sentence response continuation in the batched service: after the
    # fused first chunk, continuing sessions advance resp_segment text tokens
    # per tick (batched across sessions) up to resp_max_tokens total
    # (DuplexResponder defaults mirrored; reference generates per 8-token
    # segments until eos, bin/inference.py:160-183)
    resp_segment: int = 16
    resp_max_tokens: int = 64


@dataclass(frozen=True)
class ServingConfig:
    """Continuous-batching serving (replaces bin/pool.py replica pools)."""

    max_sessions: int = 8
    prefill_chunk_len: int = 16  # static padded chunk length for LLM prefill
    mesh_shape: Tuple[int, ...] = (1, 1)  # (data, model)
    mesh_axes: Tuple[str, ...] = ("data", "model")
    # sliding-window KV (qwen2.roll_kv): roll a session when its cache has
    # less than kv_margin free slots (the margin must cover the largest
    # appendage between checks: a chunk prefill or assistant prefix +
    # generated tokens), keeping the role prefix + the last kv_keep_recent
    # entries. Clamped to >= 64 at use — capacity protection cannot be
    # disabled (overflow would silently corrupt attention).
    kv_margin: int = 128
    kv_keep_recent: int = 512
    # double-buffered serving: the service tick dispatches step N+1 before
    # fetching step N's user predictions, hiding the per-dispatch tunnel
    # round trip (~34-55 ms) behind device compute. Decisions (respond/
    # barge-in) then run one tick later than the audio that triggered them —
    # the capacity/latency trade the production server takes (bench.py knee
    # reports both modes).
    pipeline_ticks: bool = False
    # quantize the per-session LLM KV cache to int8 (per-token-per-head
    # scales): halves KV HBM vs bf16, which is what bounds kv_len at high
    # stream counts (VERDICT r3 missing #1). None/8.
    kv_quant_bits: Optional[int] = None
    # donate the session-cache pool into every pool-swapping dispatch (tick
    # steps, KV roll, slot writes) so the device updates it in place instead
    # of holding input+output pools at once. None = auto: donate only when
    # weights + TWO pools + working slack would not fit the chip's HBM (the
    # 128-stream x kv_len-1024 int8 point needs it; smaller pools keep the
    # faster non-donated dispatch — donation bookkeeping measured ~45 ms/tick
    # slower through the tunneled device at 128 streams in r3). All pool
    # dispatches are serialized under the engine lock, so donation cannot
    # delete a buffer a concurrent reader still dispatches against.
    donate_caches: Optional[bool] = None
    # batched sentence-synthesis pool rows (runtime/tts_batch.BatchedTTS):
    # concurrent in-flight sentences across ALL sessions; 0 = auto
    # (max(4, max_sessions // 4)). Sentences beyond capacity queue per
    # session, preserving order.
    tts_pool: int = 0


@dataclass(frozen=True)
class SystemConfig:
    """Root config for the whole stack."""

    audio_llm: AudioLLMConfig = field(default_factory=AudioLLMConfig)
    tts: TTSConfig = field(default_factory=TTSConfig)
    chunker: ChunkerConfig = field(default_factory=ChunkerConfig)
    duplex: DuplexConfig = field(default_factory=DuplexConfig)
    serving: ServingConfig = field(default_factory=ServingConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------


def tiny_system() -> SystemConfig:
    """Small dims for tests: same topology, fast on CPU."""
    enc = EncoderConfig(
        input_dim=80, output_dim=64, attention_dim=64, attention_heads=4,
        linear_units=128, num_blocks=2, chunk_size=4, left_chunks=4, pe_max_len=512,
    )
    adp = AdapterConfig(enc_out_dim=64, llm_dim=512, kernel_size=5)
    llm = LLMConfig(hidden=512, num_layers=2, num_heads=8, num_kv_heads=2,
                    ffn=1024, vocab_size=512, max_kv_len=256)
    dec = SpeechDecoderConfig(idim=128, hidden=128, num_layers=2, num_heads=4,
                              ffn=256, codec_vocab=64, max_kv_len=256)
    codec = CodecConfig(
        upsample_rates=(8, 5, 5, 3), upsample_kernel_sizes=(16, 10, 10, 6),
        upsample_initial_channel=64, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), n_codes=64, global_code_num=2,
        global_feature_dim=16, global_feature_conv=(128, 16, 16, 3, 1),
        global_tokens=(0, 0),
    )
    return SystemConfig(
        audio_llm=AudioLLMConfig(encoder=enc, adapter=adp, llm=llm),
        tts=TTSConfig(decoder=dec, codec=codec, codec_chunk_size=8,
                      codec_padding_size=2, max_tokens=64, seam_window=241),
        serving=ServingConfig(max_sessions=2),
    )


def flagship_system() -> SystemConfig:
    """Full-size Freeze-Omni-class system (Qwen2-7B backbone)."""
    return SystemConfig()


def from_reference_train_yaml(configs: dict) -> AudioLLMConfig:
    """Map the reference's checkpoint train.yaml (models/utils.py:30-49:
    input_dim/output_dim + encoder_conf{overview_conf, para_conf} poured into
    argparse, + model_conf as AudioLLM kwargs) onto the typed config tree."""
    enc_conf = configs.get("encoder_conf", {})
    over = dict(enc_conf.get("overview_conf", {}))
    layer_config = over.get("encoder-layer-config", "subsampling-transformer")
    if layer_config != "subsampling-transformer":
        raise ValueError(
            f"unsupported encoder-layer-config {layer_config!r}: this rebuild "
            "implements the subsampling-transformer topology the Freeze-Omni "
            "checkpoints use (models/encoder/encoder.py:59-89)")
    para = enc_conf.get("para_conf", {})
    tr = {k.replace("transformer-", "").replace("-", "_"): v
          for k, v in dict(para.get("transformer", {})).items()
          if k.startswith("transformer-")}
    sub = {k.replace("subsampling-", "").replace("-", "_"): v
           for k, v in dict(para.get("subsampling", {})).items()
           if k.startswith("subsampling-")}
    mc = dict(configs.get("model_conf", {}))

    encoder = EncoderConfig(
        input_dim=configs.get("input_dim", 80),
        output_dim=over.get("encoder-output-dim",
                            tr.get("output_dim", 512)),
        attention_dim=tr.get("attention_dim", 512),
        attention_heads=tr.get("attention_heads", 8),
        linear_units=tr.get("linear_units", 2048),
        num_blocks=tr.get("num_blocks", 16),
        chunk_size=tr.get("chunk_size", 4),
        left_chunks=tr.get("left_chunks", 16),
        pos_enc=tr.get("pos_enc_class", "rel-enc"),
        input_layer=tr.get("input_layer", "linear"),
        positionwise=tr.get("positionwise_layer_type", "linear"),
        positionwise_conv_kernel=tr.get("positionwise_conv_kernel_size", 1),
        normalize_before=tr.get("normalize_before", True),
        concat_after=tr.get("concat_after", False),
        subsampling_rate=sub.get("rate", 4),
    )
    adapter = AdapterConfig(
        enc_out_dim=mc.get("enc_out_dim", 512),
        llm_dim=mc.get("llm_embed_dim", 3584),
        kernel_size=mc.get("kernel_size", 3),
        activation=mc.get("activation_func", "relu"),
        norm=mc.get("norm", "batch"),
    )
    heads = mc.get("llm_head_num", 28)
    llm = LLMConfig(
        hidden=mc.get("llm_embed_dim", 3584),
        num_heads=heads,
        num_kv_heads=mc.get("num_key_value_heads", heads) or heads,
    )
    return AudioLLMConfig(encoder=encoder, adapter=adapter, llm=llm)


def load_reference_app_yaml(path: str, base: "SystemConfig" = None):
    """Import the reference fork's app config
    (configs/dialog_state_pred_config.yaml — the file run by
    bin/dialog_state_pred.py:42): VAD timing, feature-gating/fbank cadence,
    sampling controls, response threshold and default prompt map onto the
    typed tree. Returns (SystemConfig, extras) where extras carries the
    non-architectural keys ({'model_path', 'llm_path'}) for checkpoint
    loading."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    cfg = base or flagship_system()

    vad_doc = doc.get("vad", {})
    vad = dataclasses.replace(
        cfg.duplex.vad,
        sample_rate=int(doc.get("audio", {}).get(
            "expected_sampling_rate", cfg.duplex.vad.sample_rate)),
        threshold=float(vad_doc.get("vad_threshold",
                                    cfg.duplex.vad.threshold)),
        min_silence_s=float(vad_doc.get("min_silent_duration_second",
                                        cfg.duplex.vad.min_silence_s)),
        speech_pad_s=float(vad_doc.get("speech_pad_second",
                                       cfg.duplex.vad.speech_pad_s)),
        history_cache_chunks=int(vad_doc.get(
            "vad_history_cache_chunk_cnt",
            cfg.duplex.vad.history_cache_chunks)))

    g_doc = doc.get("audio_feature_gating", {})
    fb = g_doc.get("fbank", {})
    gating = dataclasses.replace(
        cfg.duplex.gating,
        sample_rate=vad.sample_rate,
        feat_dim=int(fb.get("feat_dim", cfg.duplex.gating.feat_dim)),
        chunk_duration_s=float(fb.get("expected_audio_chunk_duration_in_sec",
                                      cfg.duplex.gating.chunk_duration_s)),
        frame_length_s=float(fb.get("audio_to_proc_per_step_in_sec",
                                    cfg.duplex.gating.frame_length_s)),
        frame_shift_s=float(fb.get("step_size_in_sec",
                                   cfg.duplex.gating.frame_shift_s)),
        context_duration_s=float(fb.get("context_duration_in_sec",
                                        cfg.duplex.gating.context_duration_s)),
        history_size=int(g_doc.get("feature_gating_history_size",
                                   cfg.duplex.gating.history_size)),
        onset_cache_size=int(g_doc.get("onset_input_chunk_cache_size",
                                       cfg.duplex.gating.onset_cache_size)))

    inf = doc.get("inference_control", {})
    sampling = dataclasses.replace(
        cfg.sampling,
        top_k=int(inf.get("top_k", cfg.sampling.top_k)),
        top_p=float(inf.get("top_p", cfg.sampling.top_p)),
        temperature=float(inf.get("temperature", cfg.sampling.temperature)))

    dec = doc.get("dialog_state_decision", {})
    duplex = dataclasses.replace(
        cfg.duplex, vad=vad, gating=gating,
        resp_threshold=float(dec.get("resp_threshold",
                                     cfg.duplex.resp_threshold)),
        default_prompt=str(inf.get("default_prompt",
                                   cfg.duplex.default_prompt)))

    out = dataclasses.replace(cfg, duplex=duplex, sampling=sampling)
    extras = {"model_path": doc.get("model_path"),
              "llm_path": doc.get("llm_path")}
    return out, extras


def load_system_config(path: str) -> "SystemConfig":
    """Load a SystemConfig from YAML. Sections mirror the dataclass tree
    (audio_llm.encoder/adapter/llm, tts.decoder/codec, duplex.vad/gating,
    chunker, serving, sampling); unknown keys are ignored, dashes accepted.
    Replaces the reference's three config mechanisms (argparse CLI,
    argparse-as-schema YAML pouring, flat app YAML — SURVEY.md §5)."""
    with open(path) as f:
        if path.endswith(".json"):
            # YAML 1.1 reads JSON float reprs like "1e-06" as strings
            # (no dot before the exponent); parse real JSON as JSON
            import json

            doc = json.load(f) or {}
        else:
            import yaml

            doc = yaml.safe_load(f) or {}

    def upd(cfg, d):
        return assign_from_dict(cfg, d or {})

    al = doc.get("audio_llm", {})
    audio_llm = AudioLLMConfig(
        encoder=upd(EncoderConfig(), al.get("encoder")),
        adapter=upd(AdapterConfig(), al.get("adapter")),
        llm=upd(LLMConfig(), al.get("llm")),
    )
    audio_llm = assign_from_dict(
        audio_llm, {k: v for k, v in al.items()
                    if k not in ("encoder", "adapter", "llm")})
    tts_doc = doc.get("tts", {})
    tts = TTSConfig(
        decoder=upd(SpeechDecoderConfig(), tts_doc.get("decoder")),
        codec=upd(CodecConfig(), tts_doc.get("codec")),
    )
    tts = assign_from_dict(
        tts, {k: v for k, v in tts_doc.items()
              if k not in ("decoder", "codec")})
    dp = doc.get("duplex", {})
    duplex = DuplexConfig(
        vad=upd(VADConfig(), dp.get("vad")),
        gating=upd(GatingConfig(), dp.get("gating")),
    )
    duplex = assign_from_dict(
        duplex, {k: v for k, v in dp.items() if k not in ("vad", "gating")})
    return SystemConfig(
        audio_llm=audio_llm, tts=tts,
        chunker=upd(ChunkerConfig(), doc.get("chunker")),
        duplex=duplex,
        serving=upd(ServingConfig(), doc.get("serving")),
        sampling=upd(SamplingConfig(), doc.get("sampling")),
    )


def assign_from_dict(cfg, d: dict):
    """Dataclass-friendly analogue of the reference's assign_args_from_dict
    (models/encoder/encoder.py:36-43): returns a copy of `cfg` with any matching
    keys (dash or underscore style) replaced from `d`."""
    def tupled(v):
        # YAML/JSON deliver lists; tuple-typed fields must stay tuples or
        # the frozen config becomes unhashable (it is a jit static arg)
        if isinstance(v, list):
            return tuple(tupled(x) for x in v)
        return v

    updates = {}
    names = {f.name for f in dataclasses.fields(cfg)}
    for k, v in d.items():
        k2 = k.replace("-", "_")
        if k2 in names:
            updates[k2] = tupled(v)
    return dataclasses.replace(cfg, **updates)
