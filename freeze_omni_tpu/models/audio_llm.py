"""AudioLLM core: streaming encoders + adapters + frozen LLM + dialog-state head.

Functional re-design of models/audioLLM.py:25-527. The reference keeps dual
user/system copies of the encoder and adapter (audioLLM.py:67-68, 166), a
4-class predictor head read at the last frame (214-217, 486-493), precomputed
chat-template prefix embeddings (245-251, 290-310), and a single shared KV
cache threaded through every chunk. Here:

- all per-session state is one `SessionCaches` pytree (encoder window KV, adapter
  conv caches for both identities, LLM KV cache) so sessions batch on a leading
  axis in the serving runtime — the "Model as a Server" externalized-cache design
  (models/pipeline.py:36-44) mapped onto fixed-shape arrays;
- `recognize_step` is one jittable function per identity: fbank chunk ->
  encoder -> adapter -> optional chat-prefix splice (validity-masked, so the
  same compiled step serves ipu_sl and ipu_cl) -> LLM prefill -> state head;
- `prefill_tokens` implements set_system_role (audioLLM.py:312-348);
- `generate_step` restores the upstream text-generation loop
  (bin/inference.py:140-183 semantics) returning (token, hidden) per step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import AudioLLMConfig, SamplingConfig
from ..ops.sampling import sample_top_k_top_p
from . import adapter as adapter_mod
from . import encoder as encoder_mod
from . import qwen2
from .layers import linear, linear_init


class SessionCaches(NamedTuple):
    enc_user: encoder_mod.EncoderState
    adp_user: adapter_mod.AdapterState
    enc_system: encoder_mod.EncoderState
    adp_system: adapter_mod.AdapterState
    kv: qwen2.KVCache


def init_session(cfg: AudioLLMConfig, batch: int = 1,
                 kv_dtype=jnp.float32,
                 kv_quant_bits: Optional[int] = None) -> SessionCaches:
    # encoder/adapter streaming caches share the serving dtype: a bf16
    # frontend (cast_frontend) concatenating into f32 caches would promote
    # the whole attention path back to f32 and break the scan carry dtype
    return SessionCaches(
        enc_user=encoder_mod.init_state(cfg.encoder, batch, kv_dtype),
        adp_user=adapter_mod.init_state(cfg.adapter, batch, kv_dtype),
        enc_system=encoder_mod.init_state(cfg.encoder, batch, kv_dtype),
        adp_system=adapter_mod.init_state(cfg.adapter, batch, kv_dtype),
        kv=qwen2.init_cache(cfg.llm, batch, dtype=kv_dtype,
                            quant_bits=kv_quant_bits),
    )


def reset_audio_caches(cfg: AudioLLMConfig, caches: SessionCaches) -> SessionCaches:
    """Reset encoder/adapter caches but keep the LLM KV (bin/inference.py:133-135)."""
    b = caches.kv.length.shape[0]
    dt = caches.enc_user.k_cache.dtype  # keep the session's serving dtype
    return SessionCaches(
        enc_user=encoder_mod.init_state(cfg.encoder, b, dt),
        adp_user=adapter_mod.init_state(cfg.adapter, b, dt),
        enc_system=encoder_mod.init_state(cfg.encoder, b, dt),
        adp_system=adapter_mod.init_state(cfg.adapter, b, dt),
        kv=caches.kv,
    )


def init_params(key, cfg: AudioLLMConfig, llm_dtype=jnp.float32,
                quantize_llm: bool = False, quant_bits: int = 8) -> dict:
    """quantize_llm: init the frozen backbone directly in weight-only int8
    (ops/quant.init_quantized_llm) — 7.1 GiB resident for 28-layer 7B dims,
    never materializing the bf16 tree. quant_bits=4 uses grouped int4
    (3.6 GiB; ops/quant.quantize_linear_int4)."""
    if quantize_llm:
        from ..ops.quant import init_quantized_llm
    ks = jax.random.split(key, 8)
    params = {
        "encoder_user": encoder_mod.init_params(ks[0], cfg.encoder),
        "encoder_system": encoder_mod.init_params(ks[1], cfg.encoder),
        "adapter_user": adapter_mod.init_params(ks[2], cfg.adapter),
        "adapter_system": adapter_mod.init_params(ks[3], cfg.adapter),
        "llm": (init_quantized_llm(ks[4], cfg.llm, dtype=jnp.bfloat16,
                                   bits=quant_bits)
                if quantize_llm
                else qwen2.init_params(ks[4], cfg.llm, dtype=llm_dtype)),
        # 4-logit state head (audioLLM.py:214-217)
        "predictor": linear_init(ks[5], cfg.llm.hidden, cfg.num_states,
                                 dtype=jnp.float32),
        # task-conditioning table (audioLLM.py:169, task ids 219-230)
        "task_embeddings": jax.random.normal(
            ks[6], (cfg.task_num, cfg.llm.hidden)) * 0.02,
    }
    if cfg.prompt_finetune:
        params["prompt_embeddings"] = jax.random.normal(
            ks[7], (cfg.prompt_num, cfg.llm.hidden)) * 0.02
    if cfg.prefix_finetune:
        kv_dim = cfg.llm.num_kv_heads * cfg.llm.head_dim
        params["prefix_embeddings"] = jax.random.normal(
            jax.random.fold_in(ks[7], 1),
            (cfg.llm.num_layers, 2, cfg.prefix_num, kv_dim)) * 0.02
    return params


# ---------------------------------------------------------------------------
# steps
# ---------------------------------------------------------------------------


def prefill_tokens(params, cfg: AudioLLMConfig, ids: jnp.ndarray,
                   kv: qwen2.KVCache) -> qwen2.KVCache:
    """System-role prefill: embed `ids` [B, T] and append to the KV cache
    (set_system_role, audioLLM.py:312-348)."""
    embeds = qwen2.embed_tokens(params["llm"], ids)
    _, kv = qwen2.forward(params["llm"], cfg.llm, embeds,
                          jnp.ones(ids.shape, bool), kv)
    return kv


def state_head(params, hidden_last: jnp.ndarray) -> jnp.ndarray:
    """4-logit head; softmax over the first 3 classes (audioLLM.py:486-493).
    hidden_last: [B, D] -> [B, 3] probabilities."""
    logits = linear(params["predictor"], hidden_last.astype(jnp.float32))
    return jax.nn.softmax(logits[..., :-1], axis=-1)


def _where_batch(active: jnp.ndarray, new, old, axis: int):
    shape = [1] * new.ndim
    shape[axis] = active.shape[0]
    return jnp.where(active.reshape(shape), new, old)


def _select_encoder_state(active, new, old):
    return encoder_mod.EncoderState(
        k_cache=_where_batch(active, new.k_cache, old.k_cache, 1),
        v_cache=_where_batch(active, new.v_cache, old.v_cache, 1),
        valid=jnp.where(active, new.valid, old.valid),
        pe_index=jnp.where(active, new.pe_index, old.pe_index),
        ffn_cache=(new.ffn_cache if new.ffn_cache.size == 0 else
                   _where_batch(active, new.ffn_cache, old.ffn_cache, 1)),
    )


def _select_adapter_state(active, new, old):
    return adapter_mod.AdapterState(
        c1=None if new.c1 is None else _where_batch(active, new.c1, old.c1, 0),
        c2=_where_batch(active, new.c2, old.c2, 0),
    )


def cast_frontend(params: dict, dtype=jnp.bfloat16) -> dict:
    """Cast the encoder/adapter trees (float leaves only) to `dtype`.

    The frontend is small (~100 M params) but its f32 matmuls skip the MXU's
    bf16 fast path: at 64-session serving batch the 16-block encoder alone
    measured ~79 ms device time (~0.1% MFU) — more than the 28-layer int8
    LLM prefill. Serving casts it to bf16 (measured: tick-dominating ->
    negligible); f32 stays the default for tests and training."""
    out = dict(params)
    for k in ("encoder_user", "encoder_system", "adapter_user",
              "adapter_system"):
        if k in out:
            out[k] = jax.tree.map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x, out[k])
    return out


def chunk_tokens(t_fbank: int) -> int:
    """LLM embeddings appended to the KV per fbank window of t_fbank frames
    (Conv2dSubsampling4 then the adapter's stride-2 conv). The host KV-length
    mirrors in duplex/engine.py and runtime/engine.py MUST use this — a
    hand-copied derivation that drifts from the model fires the roll late
    (silent attention corruption)."""
    return adapter_mod.out_len(encoder_mod.subsampled_len(t_fbank))


def recognize_step(
    params, cfg: AudioLLMConfig, identity: str,
    fbank_chunk: jnp.ndarray,        # [B, T_f, 80]
    is_sl: jnp.ndarray,              # [B] bool — chunk starts an IPU
    prefix_embeds: jnp.ndarray,      # [P, D] chat-template prefix for identity
    caches: SessionCaches,
    active=None,                     # [B] bool — continuous-batching gate
) -> Tuple[jnp.ndarray, SessionCaches]:
    """One audio chunk through encoder -> adapter -> LLM prefill -> state head.

    Returns ([B, 3] state probs — meaningful only for identity='user', matching
    do_prediction at audioLLM.py:393-397 — and updated caches). With `active`,
    rows where active=False leave every cache untouched and return garbage
    probs — this is how the serving runtime batches sessions whose chunks
    arrive on different ticks."""
    if identity == "user":
        enc_p, adp_p = params["encoder_user"], params["adapter_user"]
        enc_s, adp_s = caches.enc_user, caches.adp_user
    elif identity == "system":
        enc_p, adp_p = params["encoder_system"], params["adapter_system"]
        enc_s, adp_s = caches.enc_system, caches.adp_system
    else:
        raise ValueError(f"unknown identity {identity!r}")

    enc_out, enc_s_new = encoder_mod.stream_step(enc_p, cfg.encoder,
                                                 fbank_chunk, enc_s)
    embeds, adp_s_new = adapter_mod.step(adp_p, cfg.adapter, enc_out, adp_s)
    B, T, D = embeds.shape
    P = prefix_embeds.shape[0]

    if active is not None:
        enc_s_new = _select_encoder_state(active, enc_s_new, enc_s)
        adp_s_new = _select_adapter_state(active, adp_s_new, adp_s)
    enc_s, adp_s = enc_s_new, adp_s_new

    # chat-template prefix splice on IPU start (audioLLM.py:403-406): the prefix
    # occupies the first P slots; validity-masked so non-sl chunks skip it
    # within the same compiled step.
    full = jnp.concatenate(
        [jnp.broadcast_to(prefix_embeds[None], (B, P, D)).astype(embeds.dtype),
         embeds], axis=1)
    mask = jnp.concatenate(
        [jnp.broadcast_to(is_sl[:, None], (B, P)),
         jnp.ones((B, T), bool)], axis=1)
    if active is not None:
        mask = mask & active[:, None]   # inactive rows write nothing to KV

    hidden, kv = qwen2.forward(params["llm"], cfg.llm, full, mask, caches.kv)
    last = jnp.maximum(qwen2.last_valid_index(mask), 0)  # [B]
    hidden_last = jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0]
    probs = state_head(params, hidden_last)

    if identity == "user":
        caches = caches._replace(enc_user=enc_s, adp_user=adp_s, kv=kv)
    else:
        caches = caches._replace(enc_system=enc_s, adp_system=adp_s, kv=kv)
    return probs, caches


def recognize_step_dual(
    params, cfg: AudioLLMConfig,
    u_chunk: jnp.ndarray, u_sl: jnp.ndarray, u_active: jnp.ndarray,
    s_chunk: jnp.ndarray, s_sl: jnp.ndarray, s_active: jnp.ndarray,
    u_prefix: jnp.ndarray, s_prefix: jnp.ndarray,
    caches: SessionCaches,
) -> Tuple[jnp.ndarray, SessionCaches]:
    """Both identities' pending chunks through ONE LLM forward.

    The serving tick used to run recognize_step twice back-to-back (user,
    then system) — two full passes over the frozen LLM's weights per tick.
    Both identities append to the SAME session KV row in serialized order, so
    the two prefills concatenate into one token segment per row:

        [user prefix?; user chunk; system prefix?; system chunk]

    with per-piece validity masks (prefixes gated by is_sl, chunks by
    active). qwen2.forward's rank/cumsum machinery compacts valid tokens in
    order, so user tokens land in earlier KV slots and system queries see
    them while user queries cannot see system tokens — bit-for-bit the
    serial-order semantics, at HALF the LLM weight reads per tick (decode-
    shape prefill is HBM-bound; measured in bench.py --mode knee).

    Returns ([B, 3] user state probs — read at the last valid USER position,
    matching do_prediction for identity='user' (audioLLM.py:393-397) — and
    updated caches)."""
    enc_u, enc_su = encoder_mod.stream_step(
        params["encoder_user"], cfg.encoder, u_chunk, caches.enc_user)
    emb_u, adp_su = adapter_mod.step(
        params["adapter_user"], cfg.adapter, enc_u, caches.adp_user)
    enc_s, enc_ss = encoder_mod.stream_step(
        params["encoder_system"], cfg.encoder, s_chunk, caches.enc_system)
    emb_s, adp_ss = adapter_mod.step(
        params["adapter_system"], cfg.adapter, enc_s, caches.adp_system)

    enc_su = _select_encoder_state(u_active, enc_su, caches.enc_user)
    adp_su = _select_adapter_state(u_active, adp_su, caches.adp_user)
    enc_ss = _select_encoder_state(s_active, enc_ss, caches.enc_system)
    adp_ss = _select_adapter_state(s_active, adp_ss, caches.adp_system)

    B, Tu, D = emb_u.shape
    Ts = emb_s.shape[1]
    Pu, Ps = u_prefix.shape[0], s_prefix.shape[0]
    full = jnp.concatenate([
        jnp.broadcast_to(u_prefix[None], (B, Pu, D)).astype(emb_u.dtype),
        emb_u,
        jnp.broadcast_to(s_prefix[None], (B, Ps, D)).astype(emb_u.dtype),
        emb_s.astype(emb_u.dtype),
    ], axis=1)
    u_act = u_active[:, None]
    s_act = s_active[:, None]
    mask = jnp.concatenate([
        jnp.broadcast_to((u_sl[:, None] & u_act), (B, Pu)),
        jnp.broadcast_to(u_act, (B, Tu)),
        jnp.broadcast_to((s_sl[:, None] & s_act), (B, Ps)),
        jnp.broadcast_to(s_act, (B, Ts)),
    ], axis=1)

    hidden, kv = qwen2.forward(params["llm"], cfg.llm, full, mask, caches.kv)
    last_u = jnp.maximum(qwen2.last_valid_index(mask[:, : Pu + Tu]), 0)
    hidden_last = jnp.take_along_axis(hidden, last_u[:, None, None],
                                      axis=1)[:, 0]
    probs = state_head(params, hidden_last)
    caches = caches._replace(enc_user=enc_su, adp_user=adp_su,
                             enc_system=enc_ss, adp_system=adp_ss, kv=kv)
    return probs, caches


def generate_step(
    params, cfg: AudioLLMConfig, token: jnp.ndarray, kv: qwen2.KVCache,
    rng, sampling: SamplingConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, qwen2.KVCache]:
    """One text-decode step: embed token [B] -> LLM -> sample next.

    Returns (next_token [B], hidden [B, D], kv). The hidden state feeds the
    speech decoder (bin/inference.py:142-143, 162)."""
    embeds = qwen2.embed_tokens(params["llm"], token[:, None])
    hidden, kv = qwen2.forward(params["llm"], cfg.llm, embeds,
                               jnp.ones_like(token, bool)[:, None], kv)
    lg = qwen2.logits(params["llm"], cfg.llm, hidden[:, 0])
    nxt = sample_top_k_top_p(rng, lg, sampling.temperature, sampling.top_k,
                             sampling.top_p)
    return nxt, hidden[:, 0], kv


def generate_segment(
    params, cfg: AudioLLMConfig, token: jnp.ndarray, kv: qwen2.KVCache,
    rng, sampling: SamplingConfig, n_steps: int, eod_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, qwen2.KVCache]:
    """Generate up to n_steps text tokens in ONE device dispatch (lax.scan).

    Replaces per-token host round-trips (the reference's Python decode loop)
    with an on-device segment: returns (tokens [B, n], hiddens [B, n, D],
    done [B], kv). After eod, tokens repeat eod and the cache stops growing
    (masked writes)."""
    def step(carry, key):
        tok, kv, done = carry
        embeds = qwen2.embed_tokens(params["llm"], tok[:, None])
        hidden, kv = qwen2.forward(params["llm"], cfg.llm, embeds,
                                   (~done)[:, None], kv)
        lg = qwen2.logits(params["llm"], cfg.llm, hidden[:, 0])
        nxt = sample_top_k_top_p(key, lg, sampling.temperature, sampling.top_k,
                                 sampling.top_p)
        nxt = jnp.where(done, eod_id, nxt).astype(jnp.int32)
        done = done | (nxt == eod_id)
        return (nxt, kv, done), (nxt, hidden[:, 0])

    B = token.shape[0]
    done0 = jnp.zeros((B,), bool)
    keys = jax.random.split(rng, n_steps)
    (tok, kv, done), (toks, hiddens) = jax.lax.scan(
        step, (token.astype(jnp.int32), kv, done0), keys)
    return (jnp.swapaxes(toks, 0, 1), jnp.swapaxes(hiddens, 0, 1), done, kv)


def prefill_and_generate(
    params, cfg: AudioLLMConfig, ids: jnp.ndarray, kv: qwen2.KVCache,
    rng, sampling: SamplingConfig, n_steps: int, eod_id: int,
):
    """Fused 'dialog_ss' + first text segment in ONE dispatch: assistant-prefix
    prefill, first-token sample, then an on-device n-step generation scan.
    Returns (tokens [B, 1+n], hiddens [B, 1+n, D], done [B], kv)."""
    k0, k1 = jax.random.split(rng)
    tok0, h0, kv = prefill_and_sample(params, cfg, ids, kv, k0, sampling)
    toks, hiddens, done, kv = generate_segment(
        params, cfg, tok0, kv, k1, sampling, n_steps=n_steps, eod_id=eod_id)
    tokens = jnp.concatenate([tok0[:, None], toks], axis=1)
    hiddens = jnp.concatenate([h0[:, None], hiddens], axis=1)
    return tokens, hiddens, done, kv


def prefill_and_sample(
    params, cfg: AudioLLMConfig, ids: jnp.ndarray, kv: qwen2.KVCache,
    rng, sampling: SamplingConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, qwen2.KVCache]:
    """Stage 'dialog_ss': prefill the assistant chat prefix `ids` [B, T] and
    sample the first response token from the last prefix position."""
    embeds = qwen2.embed_tokens(params["llm"], ids)
    hidden, kv = qwen2.forward(params["llm"], cfg.llm, embeds,
                               jnp.ones(ids.shape, bool), kv)
    h_last = hidden[:, -1]
    lg = qwen2.logits(params["llm"], cfg.llm, h_last)
    nxt = sample_top_k_top_p(rng, lg, sampling.temperature, sampling.top_k,
                             sampling.top_p)
    return nxt, h_last, kv
