"""Behavioral duplex test (VERDICT r2 #4): train the state head on a
synthetic SEPARABLE dialog task, then assert the full
VAD -> gating -> serializer -> predict -> respond loop makes the RIGHT
dialog_ss decisions — not merely that shapes flow.

The task: a user "question" ends with a high-frequency chunk (3.5 kHz tone);
a "statement" is low-frequency (300 Hz) throughout. Policy: respond
(dialog_ss) on high-frequency chunks, stay silent otherwise. The label is a
pure function of the fbank window (high-band minus low-band mel energy), so
the correct decision is decidable and a sign flip in the state head
(audioLLM.py:118-122 / bin/dialog_state_pred.py:819-830 threshold wiring)
fails the test rather than passing on plumbing alone.

Training goes through the EXACT serving step (audio_llm.recognize_step with
the chat-prefix splice, role-prefilled KV and onset-replay window sequence the
frontend emits), so what is learned is what serves.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.config import tiny_system
from freeze_omni_tpu.frontend.chunker import GatingChunker
from freeze_omni_tpu.duplex.vad import EnergyVAD
from freeze_omni_tpu.models import audio_llm, qwen2

pytestmark = pytest.mark.slow

SR = 16000
K_MAX = 8  # windows per sequence: 2 replayed onset + 3 speech + hangover


def _cfg():
    cfg = tiny_system()
    return dataclasses.replace(
        cfg,
        audio_llm=dataclasses.replace(
            cfg.audio_llm,
            llm=dataclasses.replace(cfg.audio_llm.llm, max_kv_len=512)),
        duplex=dataclasses.replace(
            cfg.duplex,
            vad=dataclasses.replace(cfg.duplex.vad, kind="energy",
                                    system_kind="energy"),
            gating=dataclasses.replace(cfg.duplex.gating,
                                       onset_cache_size=2)))


def _tone(freq, n, amp=0.4, phase=0.0):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t + phase)).astype(np.float32)


def _utterance(cfg, question: bool, rng) -> np.ndarray:
    """1 quiet lead chunk + 3 speech chunks (last one high-freq iff question)
    + 3 quiet chunks (past min_silence -> ipu_el)."""
    n = cfg.duplex.gating.samples_per_chunk
    amp = 0.3 + 0.3 * rng.rand()
    ph = float(rng.rand() * 2 * np.pi)
    low = lambda: _tone(300.0 + 40 * rng.rand(), n, amp, ph)
    parts = [np.zeros(n, np.float32), low(), low(),
             _tone(3500.0 + 100 * rng.rand(), n, amp, ph) if question
             else low()]
    parts += [np.zeros(n, np.float32)] * 3
    return np.concatenate(parts)


def _frontend_windows(cfg, audio):
    """Replay the exact serving frontend host-side (EnergyVAD -> gating ->
    onset replay, runtime/service.py:184-233): [(window [32,80], status)]."""
    vcfg = dataclasses.replace(cfg.duplex.vad,
                               chunk_size=cfg.duplex.gating.samples_per_chunk)
    vad = EnergyVAD(vcfg)
    gate = GatingChunker(cfg.duplex.gating)
    n = cfg.duplex.gating.samples_per_chunk
    out = []
    for i in range(0, audio.shape[0] - n + 1, n):
        ann = vad.predict({"audio": audio[i:i + n], "time_stamp": 0.0})
        gated = gate.process_and_gate({"audio": ann["audio"],
                                       "status": ann["status"]})
        if gated is None:
            continue
        replay = gated.get("feature_last_chunk", [])
        if replay and gated["status"] == "ipu_sl":
            seq = [(f, "ipu_sl" if j == 0 else "ipu_cl")
                   for j, f in enumerate(replay)]
            seq.append((gated["feature"], "ipu_cl"))
        else:
            seq = [(gated["feature"], gated["status"])]
        out.extend((np.asarray(f, np.float32).reshape(-1, 80), st)
                   for f, st in seq)
    return out


def _hf_label(window: np.ndarray) -> int:
    """Ground truth: 1 iff high-band mel energy dominates (the 3.5 kHz
    question ending); a pure function of the input, independent of the model."""
    assert window.shape == (32, 80), window.shape
    return int(window[:, 45:].mean() - window[:, :35].mean() > 0.0)


def _sequences(cfg, n_q, n_s, seed):
    """-> chunks [B,K,32,80], sl [B,K], active [B,K], labels [B,K]."""
    rng = np.random.RandomState(seed)
    specs = [True] * n_q + [False] * n_s
    rng.shuffle(specs)
    B = len(specs)
    chunks = np.zeros((B, K_MAX, 32, 80), np.float32)
    sl = np.zeros((B, K_MAX), bool)
    active = np.zeros((B, K_MAX), bool)
    labels = np.zeros((B, K_MAX), np.int32)
    for b, is_q in enumerate(specs):
        wins = _frontend_windows(cfg, _utterance(cfg, is_q, rng))[:K_MAX]
        for k, (w, st) in enumerate(wins):
            chunks[b, k] = w
            sl[b, k] = st == "ipu_sl"
            active[b, k] = True
            labels[b, k] = _hf_label(w)
    assert labels.sum() >= n_q, (labels.sum(), "high-frequency windows must "
                                 "actually be present in the sequences")
    return chunks, sl, active, labels, specs


_TRAINED_CACHE = {}  # the policy depends only on the (identical) model dims;
# both tests share one training run


class TestTrainedDuplexPolicy:
    def _train(self, cfg, steps=250):
        """Train encoder_user/adapter_user/predictor through the serving
        recognize_step on the synthetic task; returns (params, core)."""
        if "params" in _TRAINED_CACHE:
            return _TRAINED_CACHE["params"], _TRAINED_CACHE["core"]
        import optax

        from freeze_omni_tpu.pipeline import _Core

        acfg = cfg.audio_llm
        core = _Core(cfg, seed=0)
        params = core.params
        role_kv = core.role_kv(cfg.duplex.default_prompt)
        prefix = core.user_prefix_embeds

        chunks, sl, active, labels, _ = _sequences(cfg, 8, 8, seed=0)
        B = chunks.shape[0]
        kv_b = qwen2.KVCache(
            k=jnp.tile(role_kv.k, (1, B, 1, 1, 1)),
            v=jnp.tile(role_kv.v, (1, B, 1, 1, 1)),
            length=jnp.tile(role_kv.length, (B,)))
        base_caches = audio_llm.init_session(acfg, B)._replace(kv=kv_b)

        trainable = {k: params[k] for k in
                     ("encoder_user", "adapter_user", "predictor")}
        frozen = {k: v for k, v in params.items() if k not in trainable}

        chunks_j = jnp.asarray(chunks)
        sl_j = jnp.asarray(sl)
        act_j = jnp.asarray(active)
        lab_j = jnp.asarray(labels)

        def loss_fn(tr):
            p = {**frozen, **tr}
            caches = base_caches
            total = 0.0
            n = 0.0
            for k in range(K_MAX):
                probs, caches = audio_llm.recognize_step(
                    p, acfg, "user", chunks_j[:, k], sl_j[:, k], prefix,
                    caches, active=act_j[:, k])
                nll = -jnp.log(jnp.take_along_axis(
                    probs, lab_j[:, k][:, None], axis=1)[:, 0] + 1e-9)
                total = total + jnp.sum(nll * act_j[:, k])
                n = n + jnp.sum(act_j[:, k])
            return total / n

        opt = optax.adam(3e-3)
        opt_state = opt.init(trainable)

        @jax.jit
        def train_step(tr, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(tr)
            updates, opt_state = opt.update(grads, opt_state, tr)
            return optax.apply_updates(tr, updates), opt_state, loss

        loss0 = None
        for i in range(steps):
            trainable, opt_state, loss = train_step(trainable, opt_state)
            if loss0 is None:
                loss0 = float(loss)
        assert float(loss) < loss0, (loss0, float(loss))

        # train-set accuracy of the thresholded decision must be high before
        # the serving assertions mean anything
        p = {**frozen, **trainable}
        caches = base_caches
        correct, n = 0, 0
        for k in range(K_MAX):
            probs, caches = audio_llm.recognize_step(
                p, acfg, "user", chunks_j[:, k], sl_j[:, k], prefix, caches,
                active=act_j[:, k])
            pred = np.asarray(probs)[:, 1] > 0.5
            m = active[:, k]
            correct += int(np.sum((pred == (labels[:, k] == 1)) & m))
            n += int(m.sum())
        acc = correct / n
        assert acc > 0.9, f"training did not converge: acc={acc:.2f}"
        _TRAINED_CACHE.update(params=p, core=core)
        return p, core

    def test_trained_policy_drives_correct_dialog_ss(self):
        """End-to-end on held-out AUDIO through DuplexService: dialog_ss
        fires on question utterances (after the high-frequency ending) and
        not on statements; then a trained-triggered response is cancelled by
        a real user barge-in."""
        from freeze_omni_tpu.runtime.engine import ServingEngine
        from freeze_omni_tpu.runtime.service import DuplexService

        cfg = _cfg()
        params, core = self._train(cfg)

        engine = ServingEngine(cfg, params=params, seed=0)
        svc = DuplexService(cfg, engine=engine)
        rng = np.random.RandomState(42)  # held-out: fresh phases/amps
        n = cfg.duplex.gating.samples_per_chunk

        tp = fp = fn = tn = 0
        for i, is_q in enumerate([True, False, True, False, True, False,
                                  True, False]):
            sid = f"u{i}"
            sink = svc.open_session(sid)
            audio = _utterance(cfg, is_q, rng)
            for j in range(0, audio.shape[0] - n + 1, n):
                svc.enqueue_audio_data(sid, "user", {"audio": audio[j:j + n]})
                svc.step()
            for _ in range(6):
                if not svc.step():
                    break
            fired = bool(sink.events_of("dialog_ss_callback"))
            if is_q and fired:
                tp += 1
            elif is_q:
                fn += 1
            elif fired:
                fp += 1
            else:
                tn += 1
            svc.close_session(sid)

        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        assert recall >= 0.75, (tp, fn, "questions missed")
        assert precision >= 0.75, (tp, fp, "spurious responses to statements")

    def test_trained_trigger_then_barge_in_and_continuation(self):
        """The response pipeline downstream of a TRAINED dialog_ss decision:
        response text/audio emits, and a genuine user speech onset mid-
        response cancels it (response_interrupted) — behavior, not forced
        thresholds."""
        from freeze_omni_tpu.models import codec as codec_mod
        from freeze_omni_tpu.models import speech_decoder as sd
        from freeze_omni_tpu.runtime.engine import ServingEngine
        from freeze_omni_tpu.runtime.service import DuplexService

        cfg = _cfg()
        cfg = dataclasses.replace(
            cfg, duplex=dataclasses.replace(cfg.duplex, resp_segment=4,
                                            resp_max_tokens=24))
        params, core = self._train(cfg)
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        tts_params = {"decoder": sd.init_params(k1, cfg.tts.decoder),
                      "codec": codec_mod.init_params(k2, cfg.tts.codec)}

        engine = ServingEngine(cfg, params=params, seed=0)
        svc = DuplexService(cfg, engine=engine, tts_params=tts_params)
        sink = svc.open_session("s1")
        rng = np.random.RandomState(77)
        n = cfg.duplex.gating.samples_per_chunk

        audio = _utterance(cfg, True, rng)
        for j in range(0, audio.shape[0] - n + 1, n):
            svc.enqueue_audio_data("s1", "user", {"audio": audio[j:j + n]})
            svc.step()
        for _ in range(4):
            svc.step()
        assert sink.events_of("dialog_ss_callback"), \
            "trained trigger never fired on a question"
        svc.flush_tts()
        assert sink.events_of("response_text"), "no response text emitted"
        assert sink.events_of("response_audio"), "no response audio emitted"

        # continuation in flight? barge in with fresh user speech
        fe = svc.sessions["s1"]
        if fe.resp is None:  # response may have completed: restart one
            fe.resp = {"last": 3, "n": 0, "toks": [], "hids": []}
        barge = _utterance(cfg, False, rng)
        for j in range(0, barge.shape[0] - n + 1, n):
            svc.enqueue_audio_data("s1", "user", {"audio": barge[j:j + n]})
            svc.step()
            if fe.resp is None:
                break
        assert fe.resp is None
        assert sink.events_of("response_interrupted")
        assert not sink.events_of("error")
