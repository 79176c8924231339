"""Close the full speech-to-speech quality loop on a TINY trained system.

VERDICT r3 next-round #4: every training stage and every eval harness in the
framework exists, but no end-to-end QUALITY had ever been demonstrated — the
state head was behaviorally trained (tests/test_behavior.py) while ASR, QA
and synthesis quality were only harness-validated with random weights. This
script trains the full curriculum on a closed synthetic audio-language and
then runs the three SHIPPED harnesses (bin/asr_eval, bin/qa_eval,
bin/out_cer_eval) against the saved NATIVE checkpoint, producing held-out
numbers materially better than chance:

world    16 two-letter "words"; each word is a deterministic two-tone
         chirp (0.2 s) — acoustically separable, byte-tokenizable text.
phase A  text-pretrain the tiny LLM on the SAME chat template the pipeline
         serves: under the transcribe role the assistant echoes the user
         text; under the QA role it answers the word's fixed partner.
         (The reference freezes a pretrained Qwen2; here the tiny "LLM
         pretraining" is this phase — afterwards it is frozen for good.)
phase B  input side, frozen LLM: brief encoder CTC warm-up, then the
         align stage — encoder+adapter trained so audio embeds land where
         the frozen LLM expects the matching text (the Freeze-Omni
         alignment idea at tiny scale), through the exact eval-time
         sequence [role; user-prefix; audio; assistant-prefix; answer].
phase C  output side: TiCodec GAN on the word audio (straight-through VQ
         + mel/adv/fm losses), then the AR speech decoder teacher-forced
         on (text embeds -> codec tokens of the spoken sentence).
save     utils.factory.save_native_system -> the shipped harnesses load it
         with --model_path, byte tokenizer, no HF assets.

Run (--platform tpu: ~15-30 min; cpu: hours at the default step counts):
  python scripts/train_tiny_s2s.py --out freeze_omni_tpu/assets/tiny_s2s
Artifacts: native checkpoint + dev manifests + QUALITY.json with the three
held-out metrics (asserted against chance in tests/test_tiny_s2s_quality.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR_ASR = 16000
WORD_S = 0.20
GAP_S = 0.06

WORDS = ["ba", "de", "fi", "go", "hu", "ja", "ke", "li",
         "mo", "nu", "pa", "re", "si", "to", "vu", "wa"]
PARTNER = {w: WORDS[(i + 5) % len(WORDS)] for i, w in enumerate(WORDS)}

TRANSCRIBE_ROLE = "Transcribe the user's speech exactly."
# must match bin/qa_eval.QA_ROLE verbatim (the harness prefills it)
QA_ROLE = ("You are a helpful assistant. Answer the user's question "
           "concisely.")


def render(words, sr: int) -> np.ndarray:
    """Deterministic waveform for a word sequence: word i = two tones
    (300+200i Hz, 500+150*((7i)%16) Hz) under a 5 Hz AM envelope."""
    wn = int(WORD_S * sr)
    gn = int(GAP_S * sr)
    t = np.arange(wn) / sr
    out = []
    for w in words:
        i = WORDS.index(w)
        f1 = 300.0 + 200.0 * i
        f2 = 500.0 + 150.0 * ((7 * i) % 16)
        env = 0.55 + 0.45 * np.sin(2 * np.pi * 5.0 * t)
        sig = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.35 * np.sin(2 * np.pi * f2 * t)
        out.append((0.45 * env * sig).astype(np.float32))
        out.append(np.zeros(gn, np.float32))
    return np.concatenate(out) if out else np.zeros(gn, np.float32)


def pad_to_chunks(wav: np.ndarray, chunk: int = 2560) -> np.ndarray:
    n = ((len(wav) + chunk - 1) // chunk) * chunk
    out = np.zeros(n, np.float32)
    out[: len(wav)] = wav
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="freeze_omni_tpu/assets/tiny_s2s")
    p.add_argument("--lm_steps", type=int, default=2500)
    p.add_argument("--ctc_steps", type=int, default=300)
    p.add_argument("--align_steps", type=int, default=4000)
    p.add_argument("--codec_steps", type=int, default=2500)
    p.add_argument("--dec_steps", type=int, default=3500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_eval", action="store_true")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                   help="cpu: run everything on host (no TPU required, "
                        "~hours at the default step counts on one core). "
                        "tpu: leave the env's device platform in place — "
                        "each training step is ONE fused jitted dispatch, "
                        "so the whole curriculum lands in ~15-30 min even "
                        "through a high-latency device tunnel")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from freeze_omni_tpu.config import tiny_system
    from freeze_omni_tpu.frontend.fbank import fbank_ref
    from freeze_omni_tpu.config import FbankConfig
    from freeze_omni_tpu.models import adapter as adapter_mod
    from freeze_omni_tpu.models import audio_llm, codec as codec_mod, qwen2
    from freeze_omni_tpu.models import encoder as encoder_mod
    from freeze_omni_tpu.models import speech_decoder as sd
    from freeze_omni_tpu.pipeline import post_process
    from freeze_omni_tpu.training import codec_gan as gan
    from freeze_omni_tpu.training import train_step as ts
    from freeze_omni_tpu.utils.tokenizer import ByteTokenizer, ChatTemplate

    cfg = tiny_system()
    cfg = dataclasses.replace(
        cfg, tts=dataclasses.replace(
            cfg.tts,
            decoder=dataclasses.replace(cfg.tts.decoder, use_prefix_kv=False),
            top_k=1, max_tokens=96))
    acfg = cfg.audio_llm
    tok = ByteTokenizer(acfg.llm.vocab_size)
    chat = ChatTemplate(tok)
    fb_cfg = FbankConfig(num_mel_bins=acfg.encoder.input_dim)
    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)

    params = audio_llm.init_params(key, acfg, llm_dtype=jnp.float32)

    def pad_ids(rows, mult=16):
        L = max(len(r) for r in rows)
        L = ((L + mult - 1) // mult) * mult
        ids = np.zeros((len(rows), L), np.int32)
        mask = np.zeros((len(rows), L), bool)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = True
        return ids, mask

    # ------------------------------------------------------------------
    # phase A: text-pretrain the tiny LLM on the serving chat template
    # ------------------------------------------------------------------
    def sample_text_pair(r):
        if r.rand() < 0.6:
            ws = [WORDS[r.randint(16)] for _ in range(r.randint(1, 5))]
            return TRANSCRIBE_ROLE, " ".join(ws), " ".join(ws)
        w = WORDS[r.randint(16)]
        return QA_ROLE, w, PARTNER[w]

    def build_lm_batch(r, B):
        rows, spans = [], []
        for _ in range(B):
            role, user, ans = sample_text_pair(r)
            ctx = chat.role_prompt_ids(role) + chat.user_prefix_ids + \
                tok.encode(user) + chat.system_prefix_ids
            full = ctx + tok.encode(ans) + [tok.eod_id]
            rows.append(full)
            spans.append(len(ctx))
        ids, mask = pad_ids(rows)
        lmask = np.zeros_like(mask)
        for i, (row, c) in enumerate(zip(rows, spans)):
            lmask[i, c: len(row)] = True   # answer + eod positions
        return ids, mask, lmask

    import functools

    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))

    # ONE fused dispatch per step (loss+grad+optimizer update): over the
    # device tunnel an eager optax.update costs ~100 tiny dispatches/step,
    # which is what made the r4 attempt at this script impractically slow
    @functools.partial(jax.jit, static_argnames=("L",))
    def lm_train_step(llm, opt_state, ids, mask, lmask, L):
        def loss_fn(lp):
            emb = qwen2.embed_tokens(lp, ids)
            cache = qwen2.init_cache(acfg.llm, ids.shape[0], max_len=L + 1,
                                     dtype=emb.dtype)
            hidden, _ = qwen2.forward(lp, acfg.llm, emb, mask, cache)
            logits = qwen2.logits(lp, acfg.llm, hidden[:, :-1])
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = ids[:, 1:]
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            m = lmask[:, 1:].astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1)

        loss, grads = jax.value_and_grad(loss_fn)(llm)
        upd, opt_state = opt.update(grads, opt_state, llm)
        return optax.apply_updates(llm, upd), opt_state, loss

    llm = params["llm"]
    opt_state = opt.init(llm)
    print("phase A: LLM text pretrain", flush=True)
    for it in range(args.lm_steps):
        ids, mask, lmask = build_lm_batch(rng, 32)
        llm, opt_state, loss = lm_train_step(
            llm, opt_state, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(lmask), ids.shape[1])
        if it % 200 == 0 or it == args.lm_steps - 1:
            print(f"  lm step {it}: ce {float(loss):.4f}", flush=True)
    params["llm"] = llm

    # text-only sanity: greedy answers on held-out prompts
    from freeze_omni_tpu.config import SamplingConfig

    greedy = SamplingConfig(top_k=1, top_p=1.0, temperature=1.0)
    gen = jax.jit(audio_llm.generate_segment,
                  static_argnames=("cfg", "sampling", "n_steps", "eod_id"))

    def text_answer(role, user, n=16):
        ctx = chat.role_prompt_ids(role) + chat.user_prefix_ids + \
            tok.encode(user) + chat.system_prefix_ids
        emb = qwen2.embed_tokens(params["llm"], jnp.asarray(ctx)[None])
        kv = qwen2.init_cache(acfg.llm, 1, max_len=len(ctx) + n + 2,
                              dtype=emb.dtype)
        hidden, kv = qwen2.forward(params["llm"], acfg.llm, emb,
                                   jnp.ones((1, len(ctx)), bool), kv)
        lg = qwen2.logits(params["llm"], acfg.llm, hidden[:, -1])
        t0 = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        toks, _, _, _ = gen(params, acfg, t0, kv,
                            jax.random.PRNGKey(0), greedy, n_steps=n,
                            eod_id=tok.eod_id)
        row = [int(t0[0])] + [int(t) for t in np.asarray(toks)[0]]
        if tok.eod_id in row:
            row = row[: row.index(tok.eod_id)]
        return tok.decode(row)

    hits = sum(text_answer(TRANSCRIBE_ROLE, w) == w for w in WORDS)
    qa_hits = sum(text_answer(QA_ROLE, w) == PARTNER[w] for w in WORDS)
    print(f"phase A sanity: echo {hits}/16, qa {qa_hits}/16", flush=True)

    # ------------------------------------------------------------------
    # phase B: frozen LLM; CTC warm-up then chat-structured alignment
    # ------------------------------------------------------------------
    print("phase B: encoder CTC warm-up", flush=True)
    ctc_head = ts.init_ctc_head(jax.random.fold_in(key, 1), acfg, len(WORDS))
    trainable = {"encoder_user": params["encoder_user"], "ctc_head": ctc_head}
    opt_b = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    st_b = opt_b.init(trainable)

    def audio_batch(r, B, n_words):
        wavs, words = [], []
        for _ in range(B):
            ws = [WORDS[r.randint(16)] for _ in range(n_words)]
            words.append(ws)
            wavs.append(pad_to_chunks(render(ws, SR_ASR)))
        T = max(len(w) for w in wavs)
        fb = np.stack([fbank_ref(np.pad(w, (0, T - len(w))) * 32768.0, fb_cfg)
                       for w in wavs])
        return jnp.asarray(fb), words

    @jax.jit
    def ctc_step(tr, st, fbank, tokens):
        def loss_fn(t):
            B, T = fbank.shape[0], fbank.shape[1]
            return ts.encoder_ctc_loss(
                t, acfg, fbank, jnp.full((B,), T, jnp.int32), tokens,
                jnp.full((B,), tokens.shape[1], jnp.int32))

        loss, grads = jax.value_and_grad(loss_fn)(tr)
        upd, st = opt_b.update(grads, st, tr)
        return optax.apply_updates(tr, upd), st, loss

    # precomputed batch pool: host-side fbank extraction dominates the step
    # otherwise, and the 16-word world exhausts its acoustic diversity after
    # a handful of draws (every word renders deterministically)
    ctc_pool = [audio_batch(rng, 8, n) for n in (1, 2, 3, 4) for _ in range(4)]
    for it in range(args.ctc_steps):
        fb, words = ctc_pool[int(rng.randint(len(ctc_pool)))]
        toks = jnp.asarray([[WORDS.index(w) for w in ws] for ws in words],
                           jnp.int32)
        trainable, st_b, loss = ctc_step(trainable, st_b, fb, toks)
        if it % 100 == 0 or it == args.ctc_steps - 1:
            print(f"  ctc step {it}: {float(loss):.4f}", flush=True)
    params["encoder_user"] = trainable["encoder_user"]

    print("phase B: chat-structured alignment (frozen LLM)", flush=True)
    tr_align = {"encoder_user": params["encoder_user"],
                "adapter_user": params["adapter_user"]}
    opt_a = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    st_a = opt_a.init(tr_align)

    # Alignment trains through the SERVING feature path, not a batch fbank
    # forward: eval (bin/asr_eval.batched_transcribe -> recognize_step) feeds
    # the encoder overlapped 19-frame OfflineChunker windows per 160 ms chunk
    # with carried encoder/adapter caches, which yields a DIFFERENT audio
    # token count than one full-sequence forward (the r4 run trained batch,
    # served streaming, and the CER errors were purely structural: first word
    # duplicated on short inputs, a word dropped on long ones).
    from freeze_omni_tpu.frontend.chunker import OfflineChunker

    CHUNK = 2560  # samples per 160 ms serving chunk (ChunkerConfig default)

    def audio_windows(r, B, n_words):
        """[B, C, 19, F] OfflineChunker windows — bitwise the features the
        eval path extracts (same n_words => same C across the batch)."""
        win_rows, words = [], []
        for _ in range(B):
            ws = [WORDS[r.randint(16)] for _ in range(n_words)]
            words.append(ws)
            wav = render(ws, SR_ASR)
            n = int(np.ceil(len(wav) / CHUNK)) * CHUNK
            padded = np.zeros(n, np.float32)
            padded[: len(wav)] = wav
            ch = OfflineChunker(cfg.chunker)
            win_rows.append(np.concatenate(
                [ch.process(padded[i: i + CHUNK]) for i in range(0, n, CHUNK)],
                axis=0))
        return jnp.asarray(np.stack(win_rows)), words

    def stream_audio_embeds(t, windows):
        """scan of stream_step+adapter.step over chunks: [B,C,19,F] ->
        [B, C*t, D] — the exact (differentiable) serving computation."""
        B = windows.shape[0]
        dt = t["encoder_user"]["cmvn"]["mean"].dtype
        enc_s = encoder_mod.init_state(acfg.encoder, B, dtype=dt)
        adp_s = adapter_mod.init_state(acfg.adapter, B, dtype=dt)

        def body(carry, w):
            es, asx = carry
            eo, es = encoder_mod.stream_step(t["encoder_user"], acfg.encoder,
                                             w, es)
            em, asx = adapter_mod.step(t["adapter_user"], acfg.adapter, eo,
                                       asx)
            return (es, asx), em

        _, ems = jax.lax.scan(body, (enc_s, adp_s),
                              jnp.moveaxis(windows, 1, 0))
        return jnp.moveaxis(ems, 0, 1).reshape(B, -1, ems.shape[-1])

    role_emb = {
        role: np.asarray(qwen2.embed_tokens(
            params["llm"], jnp.asarray(chat.role_prompt_ids(role))))
        for role in (TRANSCRIBE_ROLE, QA_ROLE)}
    upfx = np.asarray(qwen2.embed_tokens(params["llm"],
                                         jnp.asarray(chat.user_prefix_ids)))
    spfx = np.asarray(qwen2.embed_tokens(params["llm"],
                                         jnp.asarray(chat.system_prefix_ids)))

    @functools.partial(jax.jit, static_argnames=("Lr", "La"))
    def align_step(tr, st, windows, role_e, ans_ids, ans_mask, Lr, La):
        def loss_fn(t):
            audio = stream_audio_embeds(t, windows)
            B = audio.shape[0]
            aemb = qwen2.embed_tokens(params["llm"], ans_ids)
            seq = jnp.concatenate([
                jnp.broadcast_to(role_e[None], (B,) + role_e.shape),
                jnp.broadcast_to(jnp.asarray(upfx)[None], (B,) + upfx.shape),
                audio,
                jnp.broadcast_to(jnp.asarray(spfx)[None], (B,) + spfx.shape),
                aemb], axis=1).astype(jnp.float32)
            S = seq.shape[1]
            cache = qwen2.init_cache(acfg.llm, B, max_len=S + 1,
                                     dtype=seq.dtype)
            hidden, _ = qwen2.forward(params["llm"], acfg.llm, seq,
                                      jnp.ones((B, S), bool), cache)
            Ta = ans_ids.shape[1]
            pred = hidden[:, S - Ta - 1: S - 1]
            logits = qwen2.logits(params["llm"], acfg.llm, pred)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, ans_ids[..., None],
                                       axis=-1)[..., 0]
            m = ans_mask.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1)

        loss, grads = jax.value_and_grad(loss_fn)(tr)
        upd, st = opt_a.update(grads, st, tr)
        return optax.apply_updates(tr, upd), st, loss

    # pooled batches (windows + answer ids built once, cycled): the
    # acoustics are deterministic per word, but the pool must cover enough
    # word ORDERS that alignment generalizes to held-out sequences — the r4
    # run's 30-batch pool memorized (align ce 0.0, held-out CER 44%)
    def align_batch(qa: bool):
        n = 1 if qa else int(rng.randint(1, 5))
        win, words = audio_windows(rng, 12, n)
        answers = [(PARTNER[ws[0]] if qa else " ".join(ws)) for ws in words]
        rows = [tok.encode(a) + [tok.eod_id] for a in answers]
        ids, mask = pad_ids(rows, mult=4)
        return win, jnp.asarray(ids), jnp.asarray(mask)

    align_pool = {True: [align_batch(True) for _ in range(16)],
                  False: [align_batch(False) for _ in range(90)]}
    for it in range(args.align_steps):
        qa = rng.rand() < 0.3
        pool = align_pool[qa]
        fb, ids, mask = pool[int(rng.randint(len(pool)))]
        role = QA_ROLE if qa else TRANSCRIBE_ROLE
        tr_align, st_a, loss = align_step(
            tr_align, st_a, fb, jnp.asarray(role_emb[role]), ids, mask,
            role_emb[role].shape[0], ids.shape[1])
        if it % 200 == 0 or it == args.align_steps - 1:
            print(f"  align step {it} ({'qa' if qa else 'echo'}): "
                  f"{float(loss):.4f}", flush=True)
    params["encoder_user"] = tr_align["encoder_user"]
    params["adapter_user"] = tr_align["adapter_user"]
    params["encoder_system"] = jax.tree.map(lambda x: x,
                                            params["encoder_user"])
    params["adapter_system"] = jax.tree.map(lambda x: x,
                                            params["adapter_user"])

    # ------------------------------------------------------------------
    # phase C: TiCodec GAN, then the AR speech decoder
    # ------------------------------------------------------------------
    print("phase C: TiCodec GAN", flush=True)
    ccfg = cfg.tts.codec
    sr_c = ccfg.sample_rate
    gen_params = codec_mod.init_params(jax.random.fold_in(key, 2), ccfg,
                                       with_encoder=True)
    disc_params = gan.init_discriminators(jax.random.fold_in(key, 3))
    # generator 2e-3, not HiFiGAN's production 2e-4: at tiny dims / few
    # thousand steps the lower rate plateaus far above even the
    # predict-the-mean solution (measured: single-waveform overfit stuck at
    # mel 9.3 @2e-4 vs 4.5 and still falling @2e-3 after 1500 steps).
    # Discriminator stays at 2e-4: at 2e-3 the LSGAN losses exploded within
    # 200 adversarial steps and mel regressed 170 -> 344.
    g_opt, d_opt = gan.make_gan_optimizers(2e-3, disc_lr=2e-4)
    gstate = gan.GanTrainState(
        gen_params=gen_params, disc_params=disc_params,
        gen_opt=g_opt.init(gen_params), disc_opt=d_opt.init(disc_params),
        step=jnp.zeros((), jnp.int32))
    gt_fixed = jnp.asarray(np.array(ccfg.global_tokens,
                                    np.int32)[None, None, :])

    def autoencode(gp, wav):
        feats, gfeat = codec_mod.encode_features(gp, ccfg, wav)
        codes, _ = codec_mod.quantize(gp["quantizer"], ccfg,
                                      jax.lax.stop_gradient(feats),
                                      jax.lax.stop_gradient(gfeat))
        quant = codec_mod.quantizer_embed(gp["quantizer"], ccfg, codes)
        # the straight-through estimator routes reconstruction gradient
        # around the codebook, so the codebook/commitment terms must reach
        # the loss EXPLICITLY (gan_step aux) — without them the codebook
        # never left random init and every decode came out near-silent
        aux = gan.vq_losses(quant, feats)
        st = feats + jax.lax.stop_gradient(quant - feats)
        B = wav.shape[0]
        gemb = codec_mod.quantizer_embed_gst(
            gp["quantizer"], ccfg,
            jnp.broadcast_to(gt_fixed, (B,) + gt_fixed.shape[1:]))
        return codec_mod.generate(gp, ccfg, st, gemb), aux

    def wav_batch(r, B):
        seg = int((WORD_S + GAP_S) * sr_c)
        seg = ((seg + ccfg.upsample_rate - 1) // ccfg.upsample_rate) \
            * ccfg.upsample_rate
        out = np.zeros((B, 1, seg), np.float32)
        for b in range(B):
            w = render([WORDS[r.randint(16)]], sr_c)
            out[b, 0, : min(len(w), seg)] = w[:seg]
        return jnp.asarray(out)

    # pure-reconstruction warm phase first (adv_weight 0: mel + VQ only),
    # then the adversarial phase — joint-from-scratch let the discriminators
    # crush a generator whose codebook input was still noise
    warm_steps = args.codec_steps * 2 // 5
    gan_warm_j = jax.jit(lambda s, w: gan.gan_step(s, ccfg, w, autoencode,
                                                   g_opt, d_opt, 0.0))
    gan_step_j = jax.jit(lambda s, w: gan.gan_step(s, ccfg, w, autoencode,
                                                   g_opt, d_opt))
    # dead-code restarts: codebooks init in a ±1/n_codes ball while encoder
    # features are orders of magnitude larger, so without reseeding nearly
    # every feature maps to ONE entry and the decoder can only reconstruct
    # the dataset-average waveform (gan.reseed_dead_codes docstring)
    feats_j = jax.jit(lambda gp, w: codec_mod.encode_features(gp, ccfg, w)[0])
    for it in range(args.codec_steps):
        wav = wav_batch(rng, 4)
        stepf = gan_warm_j if it < warm_steps else gan_step_j
        gstate, metrics = stepf(gstate, wav)
        if it % 200 == 100 and it < args.codec_steps * 4 // 5:
            probe = feats_j(gstate.gen_params, wav_batch(rng, 16))
            reseeded, n_dead = gan.reseed_dead_codes(
                gstate.gen_params, ccfg, probe, rng)
            if n_dead:
                gstate = gstate._replace(gen_params=reseeded)
                print(f"  gan step {it}: reseeded {n_dead} dead codes",
                      flush=True)
        if it % 100 == 0 or it == args.codec_steps - 1:
            print(f"  gan step {it}: mel {float(metrics['mel']):.4f} "
                  f"vq {float(metrics['aux']):.4f} "
                  f"g {float(metrics['g_loss']):.3f} "
                  f"d {float(metrics['d_loss']):.3f}", flush=True)
    codec_params = gstate.gen_params

    print("phase C: AR speech decoder", flush=True)
    dcfg = cfg.tts.decoder
    dec_params = sd.init_params(jax.random.fold_in(key, 4), dcfg)
    opt_d = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    st_d = opt_d.init(dec_params)
    encode_j = jax.jit(lambda w: codec_mod.encode(codec_params, ccfg, w))

    def dec_batch(r, B, n_words):
        hids, ys = [], []
        for _ in range(B):
            ws = [WORDS[r.randint(16)] for _ in range(n_words)]
            text = post_process(" ".join(ws))
            ids = tok.encode(text)
            emb = np.asarray(qwen2.embed_tokens(params["llm"],
                                                jnp.asarray(ids)), np.float32)
            hids.append(emb.reshape(-1, dcfg.idim))
            w = render(ws, sr_c)
            n = ((len(w) + ccfg.upsample_rate - 1) // ccfg.upsample_rate) \
                * ccfg.upsample_rate
            w = np.pad(w, (0, n - len(w)))
            codes, _ = encode_j(jnp.asarray(w[None, None, :]))
            ys.append(np.asarray(codes)[0, :, 0])
        Th = max(h.shape[0] for h in hids)
        Ty = max(len(y) for y in ys)
        hidden = np.zeros((B, Th, dcfg.idim), np.float32)
        h_lens = np.zeros((B,), np.int32)
        y = np.zeros((B, Ty + 1), np.int32)
        y_lens = np.zeros((B,), np.int32)
        for b, (h, yy) in enumerate(zip(hids, ys)):
            hidden[b, : h.shape[0]] = h
            h_lens[b] = h.shape[0]
            y[b, : len(yy)] = yy
            y_lens[b] = len(yy)
        return (jnp.asarray(hidden), jnp.asarray(h_lens), jnp.asarray(y),
                jnp.asarray(y_lens))

    @jax.jit
    def dec_step(dp, st, hidden, h_lens, y, y_lens):
        def loss_fn(d):
            return ts.speech_decoder_loss(d, dcfg, hidden, h_lens, y,
                                          y_lens) / hidden.shape[0]

        loss, grads = jax.value_and_grad(loss_fn)(dp)
        upd, st = opt_d.update(grads, st, dp)
        return optax.apply_updates(dp, upd), st, loss

    # pooled (hidden, codes) batches: dec_batch costs ~16 device round trips
    # (per-sample encode + embed), so building each batch once and cycling
    # keeps the loop at one dispatch per step. 120 batches (~960 sentences)
    # cover enough of the 1-3-word composition space to generalize — the r4
    # 36-batch pool memorized (dec ce 0.0000, held-out out-CER 123%)
    dec_pool = [dec_batch(rng, 8, int(rng.randint(1, 4))) for _ in range(120)]
    for it in range(args.dec_steps):
        batch = dec_pool[int(rng.randint(len(dec_pool)))]
        dec_params, st_d, loss = dec_step(dec_params, st_d, *batch)
        if it % 200 == 0 or it == args.dec_steps - 1:
            print(f"  dec step {it}: ce {float(loss):.4f}", flush=True)

    # ------------------------------------------------------------------
    # save the native checkpoint + dev manifests
    # ------------------------------------------------------------------
    from freeze_omni_tpu.utils.factory import save_native_system

    out = args.out
    os.makedirs(out, exist_ok=True)
    # the codec ENCODER (38 MB of the 60 MB tree) is a training-only tool
    # (wav -> codes targets); serving/eval only decode — drop it so the
    # committed checkpoint stays small
    codec_serve = {k: v for k, v in codec_params.items() if k != "encoder"}
    tts_params = {"decoder": dec_params, "codec": codec_serve}
    save_native_system(out, cfg, params, tts_params)
    print(f"saved native checkpoint to {out}", flush=True)

    from freeze_omni_tpu.frontend.wav import write_wav

    wav_dir = os.path.join(out, "dev_wavs")
    os.makedirs(wav_dir, exist_ok=True)
    r_ho = np.random.RandomState(10**6 + args.seed)  # held-out draws
    with open(os.path.join(out, "asr_dev.tsv"), "w") as f:
        for i in range(24):
            ws = [WORDS[r_ho.randint(16)] for _ in range(r_ho.randint(2, 5))]
            path = os.path.join(wav_dir, f"asr_{i:03d}.wav")
            write_wav(path, render(ws, SR_ASR), SR_ASR)
            f.write(f"{path}\t{' '.join(ws)}\n")
    with open(os.path.join(out, "qa_dev.tsv"), "w") as f:
        for i, w in enumerate(WORDS):
            path = os.path.join(wav_dir, f"qa_{i:03d}.wav")
            write_wav(path, render([w], SR_ASR), SR_ASR)
            f.write(f"{path}\t{PARTNER[w]}\n")
    with open(os.path.join(out, "sentences.txt"), "w") as f:
        for i in range(12):
            ws = [WORDS[r_ho.randint(16)] for _ in range(r_ho.randint(2, 4))]
            f.write(" ".join(ws) + "\n")

    if args.skip_eval:
        return

    # ------------------------------------------------------------------
    # run the SHIPPED harnesses against the checkpoint
    # ------------------------------------------------------------------
    from freeze_omni_tpu.bin import asr_eval, out_cer_eval, qa_eval
    import contextlib
    import io

    def run(main_fn, argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            main_fn(argv)
        line = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
        return json.loads(line[-1])

    print("eval: asr_eval (CER)", flush=True)
    asr = run(asr_eval.main, [
        "--model_path", out, "--manifest", os.path.join(out, "asr_dev.tsv"),
        "--char_level", "--batch", "8", "--max_tokens", "24"])
    print("eval: qa_eval", flush=True)
    qa = run(qa_eval.main, [
        "--model_path", out, "--manifest", os.path.join(out, "qa_dev.tsv"),
        "--batch", "8", "--max_tokens", "12"])
    print("eval: out_cer_eval", flush=True)
    ocer = run(out_cer_eval.main, [
        "--model_path", out, "--manifest", os.path.join(out, "sentences.txt"),
        "--top_k", "1,2", "--max_tokens", "24"])

    # codec-oracle CER: GROUND-TRUTH waveform -> trained codec encode/decode
    # -> the shipped ASR. Needs the codec ENCODER, which the serving
    # checkpoint deliberately drops, so only the trainer can compute it.
    # It splits out_cer into its two failure modes: oracle ~ asr_cer means
    # the codec is transparent and any out_cer excess is the AR speech
    # decoder; oracle ~ 100% means the codec itself is unintelligible.
    print("eval: codec oracle", flush=True)
    from freeze_omni_tpu.bin.asr_eval import transcribe
    from freeze_omni_tpu.frontend.chunker import OfflineChunker
    from freeze_omni_tpu.frontend.wav import resample
    from freeze_omni_tpu.pipeline import InferencePipeline
    from freeze_omni_tpu.utils.factory import load_native_system
    from freeze_omni_tpu.utils.metrics import corpus_score

    cfg_n, ap_n, _tts_n, tok_n = load_native_system(out)
    pl_n = InferencePipeline(cfg_n, params=ap_n, tokenizer=tok_n, seed=0)
    chk_n = OfflineChunker(cfg_n.chunker)
    roundtrip_j = jax.jit(lambda w: codec_mod.decode(
        codec_params, ccfg, codec_mod.encode(codec_params, ccfg, w)[0],
        jnp.broadcast_to(gt_fixed, (w.shape[0],) + gt_fixed.shape[1:])))
    oracle_pairs = []
    with open(os.path.join(out, "sentences.txt")) as f:
        oracle_sents = [ln.strip() for ln in f if ln.strip()]
    for i, sent in enumerate(oracle_sents):
        w = render(sent.split(), sr_c)
        n = ((len(w) + ccfg.upsample_rate - 1) // ccfg.upsample_rate) \
            * ccfg.upsample_rate
        w = np.pad(w, (0, n - len(w)))
        rec = np.asarray(roundtrip_j(jnp.asarray(w[None, None, :])))[0, 0]
        write_wav(os.path.join(wav_dir, f"oracle_{i:03d}.wav"),
                  rec.astype(np.float32), sr_c)
        hyp = transcribe(pl_n, chk_n, resample(rec, sr_c, SR_ASR),
                         max_tokens=24)
        oracle_pairs.append((sent, hyp))
    oracle_cer = 100.0 * corpus_score(oracle_pairs, char_level=True)
    print(f"codec oracle CER: {oracle_cer:.2f}%", flush=True)

    quality = {
        "asr_cer_pct": asr["value"],
        "qa_accuracy_pct": qa["value"],
        "out_cer_pct": ocer["value"],
        "out_cer_by_top_k": ocer["by_top_k"],
        "codec_oracle_cer_pct": round(oracle_cer, 2),
        "chance": {"qa_accuracy_pct": 100.0 / len(WORDS),
                   "cer_pct": "~100 (random decodes share few chars)"},
        "world": {"n_words": len(WORDS), "word_s": WORD_S,
                  "phaseA_echo_acc": hits / 16, "phaseA_qa_acc": qa_hits / 16},
        "steps": {"lm": args.lm_steps, "ctc": args.ctc_steps,
                  "align": args.align_steps, "codec": args.codec_steps,
                  "decoder": args.dec_steps},
    }
    with open(os.path.join(out, "QUALITY.json"), "w") as f:
        json.dump(quality, f, indent=1)
    print(json.dumps(quality, indent=1), flush=True)


if __name__ == "__main__":
    main()
