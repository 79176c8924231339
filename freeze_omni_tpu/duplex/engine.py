"""Duplex dialog-state engine: per-session orchestration.

Re-design of `DialogStateParams` (bin/dialog_state_pred.py:65-888). The
reference runs 6+ Python threads per session (input demux, 2x VAD, 2x feature
gating, serializer, predictor) synchronized by queues; here each session is a
deterministic event-driven engine: `enqueue_audio_data` buffers raw PCM and
`pump()` (called from an optional worker thread or directly) drives

    PCM -> VAD (IPU lifecycle + events) -> fbank gating -> timestamp
    serializer -> dialog-state prediction (one jitted device step per 224 ms
    chunk) -> threshold decision + events

All device state (shared LLM KV, per-identity encoder/adapter caches) lives in
explicit pytrees, so any engine instance can run against any pipeline replica
and sessions can later be batched by the serving runtime.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..frontend.chunker import GatingChunker
from ..pipeline import DuplexPipeline
from ..utils.queues import PCMQueue
from .events import EventSink
from .ipu import IPUHandle
from .serializer import ContextSerializer
from .vad import make_vad

IDENTITIES = ("user", "system")


class DuplexSession:
    EXPECTED_ENCODING = "s16le"

    def __init__(self, pipeline: DuplexPipeline, cfg: SystemConfig,
                 sink: Optional[EventSink] = None, sid: str = "",
                 user_ipu_outlets: Optional[List] = None, responder=None):
        self.pipeline = pipeline
        self.cfg = cfg
        self.sid = sid
        self.sink = sink or EventSink()
        self.user_ipu_outlets = user_ipu_outlets or []
        self.responder = responder  # optional DuplexResponder: closes the loop
        self.resp_threshold = cfg.duplex.resp_threshold

        gating_cfg = cfg.duplex.gating
        samples = gating_cfg.samples_per_chunk
        # VAD decisions at the 224 ms prediction cadence
        vad_cfg = cfg.duplex.vad
        import dataclasses

        vad_cfg = dataclasses.replace(vad_cfg, chunk_size=samples)

        self.pcm: Dict[str, PCMQueue] = {i: PCMQueue() for i in IDENTITIES}
        self._resamplers: Dict[str, object] = {}  # lazy, per client rate
        self.vad = {i: make_vad(vad_cfg, identity=i) for i in IDENTITIES}
        self.gating = {i: GatingChunker(gating_cfg) for i in IDENTITIES}
        self.serializer = ContextSerializer()
        self.current_ipu: Dict[str, Optional[IPUHandle]] = {
            i: None for i in IDENTITIES}

        # system-role prefill once; reused as the reset point for the shared KV
        _, self.system_role_kv, _, _, _ = pipeline.speech_dialogue(
            None, identity="", status="pre",
            role=cfg.duplex.default_prompt)
        # host mirrors so per-chunk handling never blocks on a device fetch
        # (the batched engine keeps the same mirror, runtime/engine.py): one
        # authoritative fetch here; chunk appends are advanced exactly on host
        self._role_len = int(np.asarray(self.system_role_kv.length)[0])
        self._prefix_len = {
            "user": int(pipeline.core.user_prefix_embeds.shape[0]),
            "system": int(pipeline.core.system_prefix_embeds.shape[0])}
        self.reset_context()

        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None
        self.dialog_state = "dialog_sl"

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def reset_context(self) -> None:
        """Fresh session context; shared KV restarts from the system-role
        prefill (dialog_state_pred.py:170-232). KV arrays are immutable
        pytrees, so no deepcopy is needed — we simply rebind."""
        self.past_key_values = self.system_role_kv
        self._kv_len: Optional[int] = self._role_len  # host KV-length mirror
        self.caches = {i: {"encoder_cache": None, "adapter_cache": None,
                           "pe_index": 0} for i in IDENTITIES}
        for i in IDENTITIES:
            self.vad[i].reset()
            self.gating[i].reset()
        self.serializer.reset()
        self.dialog_state = "dialog_sl"

    def start(self, interval: float = 0.005) -> None:
        if self._worker is not None:
            return

        def loop():
            while not self._stop.is_set():
                try:
                    worked = self.pump()
                except Exception as e:
                    # failure containment (the reference's try/except ->
                    # release() teardown, dialog_state_pred.py:595-598): emit,
                    # drop the poisoned queues, keep the session alive
                    self.sink.emit("error", {"where": "pump", "message": str(e)})
                    for q in self.pcm.values():
                        q.clear()
                    worked = False
                if not worked:
                    time.sleep(interval)

        self._worker = threading.Thread(target=loop, daemon=True)
        self._worker.start()

    def release(self) -> None:
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=5.0)
            self._worker = None

    # ------------------------------------------------------------------
    # input
    # ------------------------------------------------------------------

    def enqueue_audio_data(self, identity: str, data: dict) -> None:
        """data: {'audio': bytes (s16le) | float array, 'sr': int,
        'enc': 's16le'|'f32', 'time_stamp': float} — the contract of
        DialogStateParams.enqueue_audio_data (dialog_state_pred.py:330-400).

        Unlike the reference (which rejects non-16k input,
        dialog_state_pred.py:348-400), arbitrary client rates are accepted:
        chunks stream through a per-identity StreamingResampler to the VAD
        rate with no per-message boundary artifacts."""
        assert identity in IDENTITIES, identity
        want = self.cfg.duplex.vad.sample_rate
        sr = data.get("sr", want)
        audio = data["audio"]
        if isinstance(audio, (bytes, bytearray)):
            audio = np.frombuffer(bytes(audio), "<i2").astype(np.float32) \
                / 32768.0
        else:
            audio = np.asarray(audio, np.float32)
        if sr != want:
            rs = self._resamplers.get(identity)
            if rs is None or rs.orig_sr != sr:
                from ..frontend.wav import StreamingResampler
                rs = self._resamplers[identity] = StreamingResampler(sr, want)
            audio = rs.push(audio)
        self.pcm[identity].push(audio)
        if identity == "user":
            self.sink.emit("audio_rebroadcast",
                           {"identity": identity,
                            "time_stamp": data.get("time_stamp")})

    # ------------------------------------------------------------------
    # engine step
    # ------------------------------------------------------------------

    def pump(self) -> bool:
        """Process all complete chunks; returns True if any work was done."""
        worked = False
        for identity in IDENTITIES:
            while True:
                chunk = self.pcm[identity].pull(self.vad[identity].get_chunk_size())
                if chunk is None:
                    break
                worked = True
                self._vad_stage(identity, chunk)
        while True:
            feat = self.serializer.get_next_feature()
            if feat is None:
                if len(self.serializer) == 0:
                    break
                continue  # gated out; keep draining
            worked = True
            self._predict_stage(feat)
        return worked

    def _vad_stage(self, identity: str, chunk: np.ndarray) -> None:
        ts = time.time()
        ann = self.vad[identity].predict({"audio": chunk, "time_stamp": ts})
        self.sink.emit("vad_state_update",
                       {"identity": identity, "prob": ann["prob"],
                        "time_stamp": ts})

        status = ann["status"]
        # IPU lifecycle (dialog_state_pred.py:484-563)
        if status == "ipu_sl":
            handle = IPUHandle(identity, ts)
            self.current_ipu[identity] = handle
            if identity == "user":
                for outlet in self.user_ipu_outlets:
                    outlet(handle)
            handle.add_chunk(ann["audio"], ts)
        elif status in ("ipu_cl", "ipu_el"):
            handle = self.current_ipu[identity]
            if handle is not None:
                handle.add_chunk(ann["audio"], ts)
                if status == "ipu_el":
                    handle.set_end_timestamp(ts)
        if status is not None:
            self.sink.emit("vad_event", {
                "identity": identity, "status": status,
                "ipu_id": getattr(self.current_ipu[identity], "id", None),
                "time_stamp": ts})

        gated = self.gating[identity].process_and_gate(
            {"audio": ann["audio"], "status": status})
        if gated is None:
            return
        # onset replay: on ipu_sl, pre-onset history chunks enter first as an
        # ipu_sl + ipu_cl... sequence, then the current chunk as ipu_cl
        # (dialog_state_pred.py:639-670)
        replay = gated.get("feature_last_chunk", [])
        if replay and gated["status"] == "ipu_sl":
            seq = [(f, "ipu_sl" if i == 0 else "ipu_cl")
                   for i, f in enumerate(replay)]
            seq.append((gated["feature"], "ipu_cl"))
        else:
            seq = [(gated["feature"], gated["status"])]
        for k, (f, st) in enumerate(seq):
            self.serializer.add_feature_chunk({
                "time_stamp": ts + 1e-6 * k, "identity": identity,
                "status": st,
                "feature": np.asarray(f, np.float32),
                "ipu_id": getattr(self.current_ipu[identity], "id", None),
            })

    def _predict_stage(self, feat: dict) -> None:
        identity = feat["identity"]
        # The reference lets the shared KV grow unbounded within a session
        # (SURVEY.md §5 long-context note); here the cache is fixed-capacity
        # and sessions nearing it ROLL (qwen2.roll_kv): the role prefill stays
        # pinned and the most recent window of dialog survives in place.
        # The length check runs off the host mirror — per-chunk handling must
        # not block on a device fetch (a tunneled fetch costs ~55 ms against
        # a 224 ms budget); the mirror is advanced exactly below and only
        # refetched after a response (generated length is data-dependent).
        if self._kv_len is None:
            self._kv_len = int(np.asarray(self.past_key_values.length)[0])
        kv_len = self._kv_len
        cap = self.past_key_values.k.shape[2]
        margin = max(self.cfg.serving.kv_margin, 64)
        if kv_len > cap - margin:
            from ..models import qwen2 as _qwen2

            prefix = self.system_role_kv.length
            # post-roll length targets half the usable window (see
            # runtime/engine._maybe_roll_kv)
            target = (cap - margin) // 2
            keep = int(min(max(target - self._role_len, 16),
                           self.cfg.serving.kv_keep_recent))
            self.past_key_values = _qwen2.roll_kv(
                self.cfg.audio_llm.llm, self.past_key_values, prefix,
                jnp.full_like(prefix, keep), jnp.ones_like(prefix, bool))
            self._kv_len = self._role_len + keep
            self.sink.emit("kv_roll", {
                "identity": identity, "kept_recent": keep,
                "time_stamp": feat["time_stamp"]})
        c = self.caches[identity]
        pred, kv, adp, enc, pe = self.pipeline.speech_dialogue(
            feat["feature"], identity, feat["status"],
            past_key_values=self.past_key_values,
            adapter_cache=c["adapter_cache"], encoder_cache=c["encoder_cache"],
            pe_index=c["pe_index"])
        self.past_key_values = kv
        c.update(adapter_cache=adp, encoder_cache=enc, pe_index=pe)
        # exact host-side append accounting: chat prefix on ipu_sl + the
        # chunk's adapter tokens
        from ..models.audio_llm import chunk_tokens

        self._kv_len += chunk_tokens(np.asarray(feat["feature"]).shape[-2]) \
            + (self._prefix_len[identity] if feat["status"] == "ipu_sl" else 0)

        if pred is None:
            return
        ts = feat["time_stamp"]
        decision = "dialog_cl"
        if pred["state_1"] > self.resp_threshold:
            decision = "dialog_ss"
            self.sink.emit("dialog_ss_callback", {
                "ipu_id": feat.get("ipu_id"), "state_1": pred["state_1"],
                "time_stamp": ts})
            if self.responder is not None:
                self._respond()
        elif pred["state_2"] > self.resp_threshold:
            decision = "dialog_el"  # end-without-response (collapsed to cl in
            # the fork, dialog_state_pred.py:828-830)
        self.dialog_state = decision
        self.sink.emit("dialog_state_update", {
            "state": decision, "probs": pred, "time_stamp": ts})
        handle = self.current_ipu["user"]
        if handle is not None:
            handle.register_response_state(
                {"time_stamp": ts, "decision": decision, **pred})

    def _respond(self) -> None:
        """Generate and speak a response on the shared context; the
        synthesized audio re-enters as system-identity input so the predictor
        hears the system speaking (the upstream duplex loop)."""
        try:
            # generated token count is data-dependent: invalidate the host
            # length mirror; the next chunk refetches it once
            self._kv_len = None
            for text, pcm16, kv in self.responder.respond(self.past_key_values):
                self.past_key_values = kv
                self.sink.emit("response_text", {"text": text})
                if pcm16 is not None and pcm16.size:
                    self.sink.emit("response_audio",
                                   {"pcm": pcm16, "sr": 16000})
                    self.enqueue_audio_data("system", {"audio": pcm16,
                                                       "enc": "f32"})
        except Exception as e:  # responder failure must not kill the session
            self.sink.emit("error", {"where": "responder", "message": str(e)})

    # ------------------------------------------------------------------

    def warmup(self) -> None:
        """Push synthetic sl/cl..el sequences through both identities to
        compile every (identity, status) step shape
        (warmup_compiled_methods, dialog_state_pred.py:846-888)."""
        n = self.cfg.duplex.gating.samples_per_chunk
        loud = (0.5 * np.sin(2 * np.pi * 220 * np.arange(3 * n) / 16000)
                ).astype(np.float32)
        quiet = np.zeros(4 * n, np.float32)
        # warmup traffic must not reach subscribers or IPU consumers
        real_sink, real_outlets = self.sink, self.user_ipu_outlets
        self.sink, self.user_ipu_outlets = EventSink(), []
        try:
            for identity in IDENTITIES:
                self.enqueue_audio_data(identity, {"audio": quiet[:n], "enc": "f32"})
                self.enqueue_audio_data(identity, {"audio": loud, "enc": "f32"})
                self.enqueue_audio_data(identity, {"audio": quiet, "enc": "f32"})
            while self.pump():
                pass
        finally:
            self.sink, self.user_ipu_outlets = real_sink, real_outlets
        self.reset_context()
