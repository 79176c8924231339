"""Duplex dialog-state server.

Fills the role of the reference's absent `bin/server.py` (referenced by
scripts/run_demo_server.sh:22): a websocket server that hosts duplex sessions
and streams the monitoring-GUI event catalog (ENHANCED_DEMO.md — VAD state
updates, VAD events, dialog-state updates, dialog_ss callbacks) as JSON
messages instead of Socket.IO.

Protocol (JSON messages):
  client -> server:
    {"type": "start_session", "sid": str, "role": str?}
    {"type": "audio", "identity": "user"|"system", "pcm_b64": <s16le b64>,
     "sr": int (any rate; non-16k streams through a per-identity native
     resampler), "time_stamp": float?}
    {"type": "reset"} | {"type": "stop"}
  server -> client:
    {"event": "session_ready", "sid": ...}
    {"event": "vad_state_update"|"vad_event"|"dialog_state_update"|
     "dialog_ss_callback", ...payload}

Run: python -m freeze_omni_tpu.bin.serve --preset tiny --port 8765
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import json
import sys
import threading

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="freeze-omni-tpu duplex server")
    p.add_argument("--preset", default="flagship", choices=["tiny", "flagship"])
    p.add_argument("--config", default=None,
                   help="YAML config: either this framework's system schema "
                        "(config.load_system_config) or the reference fork's "
                        "app config (configs/dialog_state_pred_config.yaml "
                        "sections are auto-detected; its model_path/llm_path "
                        "apply unless overridden)")
    p.add_argument("--model_path", default=None,
                   help="reference checkpoint dir (loads converted weights)")
    p.add_argument("--llm_path", default=None)
    p.add_argument("--quant", default=None, type=int, choices=[0, 8, 4],
                   help="weight-only quantization bits for a loaded LLM "
                        "(0 = off). Default: 8 when --model_path is given "
                        "without --tp — the bf16 7B does not fit one 16 GB "
                        "chip; 0 under --tp (bf16 shards over the mesh)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--max_sessions", type=int, default=8)
    p.add_argument("--pipeline_ticks", action="store_true",
                   help="double-buffered serving: dispatch tick N+1 before "
                        "fetching tick N's predictions (hides the per-tick "
                        "dispatch round trip; decisions run one 224 ms tick "
                        "late). The high-capacity production mode.")
    p.add_argument("--kv_quant", type=int, default=0, choices=[0, 8],
                   help="int8-quantize the per-session LLM KV cache "
                        "(per-token-per-head scales): halves KV HBM, "
                        "doubling the context length that fits at high "
                        "stream counts")
    p.add_argument("--voice_wav", default=None,
                   help="voice prompt: reference wav whose TiCodec global "
                        "style tokens condition all synthesized speech")
    p.add_argument("--lora", default=None,
                   help="LoRA adapter .npz (bin/train.py --stage lora): "
                        "merged into the LLM weights at boot — works with "
                        "bf16 AND quantized checkpoints (dequant-merge-"
                        "requant), zero serving overhead")
    p.add_argument("--lora_scale", type=float, default=None,
                   help="override the merge scale stored in the adapter")
    p.add_argument("--state_dir", default=None,
                   help="serving checkpoint dir (requires --engine, "
                        "single-host): restore saved sessions at boot and "
                        "snapshot all live sessions' KV context at shutdown "
                        "— clients reconnecting with the same sid resume "
                        "mid-conversation")
    p.add_argument("--resume_grace", type=float, default=300.0,
                   help="seconds a restored session waits for its client to "
                        "reconnect before its slot is reclaimed")
    p.add_argument("--respond", action="store_true",
                   help="attach the duplex responder: on dialog_ss the server "
                        "speaks back (response_text/response_audio events)")
    p.add_argument("--resp_threshold", type=float, default=None,
                   help="override dialog_state_decision.resp_threshold")
    p.add_argument("--no_tts_warmup", action="store_true",
                   help="skip pre-compiling the synthesis pool's shape "
                        "closure at boot (--engine --respond): faster boot, "
                        "but the first spoken sentence compiles flagship-size "
                        "programs on the tick thread (multi-second stall)")
    p.add_argument("--http_port", type=int, default=0,
                   help="also serve the monitoring GUI (monitor.html) over "
                        "HTTP on this port")
    p.add_argument("--engine", action="store_true",
                   help="serve all sessions through the continuous-batching "
                        "DuplexService (one batched device step per tick) "
                        "instead of per-session pipelines")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways for the frozen LLM (--engine "
                        "mode): builds a (1, tp) mesh over the first tp "
                        "devices; KV heads shard over 'model' via ICI "
                        "collectives")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--timeout", type=float, default=None,
                   help="stop serving after N seconds (for smoke tests)")
    # multi-host (DCN) serving: one process per host, identical flags except
    # --host_id. Host 0 owns the sockets; followers replay its device steps
    # in lockstep (runtime/multihost_serving.py). KV session rows shard over
    # hosts; --tp shards the LLM inside each host.
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 — enables multi-host "
                        "(env: FO_COORDINATOR/FO_NUM_HOSTS/FO_HOST_ID)")
    p.add_argument("--num_hosts", type=int, default=1)
    p.add_argument("--host_id", type=int, default=0)
    return p.parse_args(argv)


class Server:
    def __init__(self, args, multi: bool = False):
        from ..config import flagship_system, tiny_system
        from ..pipeline import DuplexPipeline

        self.args = args
        self.multi = multi
        self.follower = None  # (engine, tts_params) on non-primary hosts
        if args.tp > 1 and not args.engine:
            raise SystemExit("--tp requires --engine (the per-session "
                             "pipeline path is single-device)")
        if multi and not args.engine:
            raise SystemExit("--coordinator requires --engine (multi-host "
                             "serving is the batched engine path)")
        if args.state_dir and (not args.engine or multi):
            raise SystemExit("--state_dir requires --engine and is "
                             "single-host (the snapshot fetch/import are not "
                             "wired through the lockstep bundles at boot)")
        # --respond works multi-host: respond_fast_many/continue_segments are
        # lockstep bundle ops, and the sentence-TTS re-embed (the one
        # global-mesh collective outside them) rides an "embed" bundle;
        # decoder+vocoder run primary-only on host-local TTS params.
        self._ckpt_params = None
        self._ckpt_tts = None
        self._tokenizer = None
        base_cfg = None
        if args.config:
            import yaml as _yaml

            from ..config import load_reference_app_yaml, load_system_config

            with open(args.config) as f:
                doc = _yaml.safe_load(f) or {}
            if ("audio_feature_gating" in doc or "dialog_state_decision" in doc
                    or "inference_control" in doc):
                import os as _os

                base_cfg, extras = load_reference_app_yaml(
                    args.config, base=(tiny_system() if args.preset == "tiny"
                                       else flagship_system()))
                # the YAML's checkpoint paths apply only when present on disk
                # (the reference file pins another machine's absolute paths)
                if not args.model_path and extras["model_path"] and \
                        _os.path.isdir(extras["model_path"]):
                    args.model_path = extras["model_path"]
                if not args.llm_path and extras["llm_path"] and \
                        _os.path.isdir(extras["llm_path"]):
                    args.llm_path = extras["llm_path"]
            else:
                base_cfg = load_system_config(args.config)
        if args.model_path:
            from ..utils.factory import (build_system_from_reference,
                                         is_native_system,
                                         load_native_system)

            if is_native_system(args.model_path):
                # bin/convert_ckpt.py output: pre-converted (and possibly
                # pre-quantized) pytrees restore directly
                (self.cfg, self._ckpt_params, self._ckpt_tts,
                 self._tokenizer) = load_native_system(args.model_path)
            else:
                # int8 weight-only is the default with or without TP: the
                # PartitionSpecs cover quantized trees (parallel/mesh.py
                # _linear_spec), so 2-chip int8 — the natural high-throughput
                # deployment — works from the CLI
                quant = 8 if args.quant is None else args.quant
                (self.cfg, self._ckpt_params, self._ckpt_tts,
                 self._tokenizer) = build_system_from_reference(
                    args.model_path, args.llm_path,
                    quantize_llm_bits=quant or None)
        else:
            self.cfg = base_cfg or (tiny_system() if args.preset == "tiny"
                                    else flagship_system())
            if args.preset == "flagship":
                # weightless full-scale serving (random params, e.g. a scale
                # smoke on real hardware): letting the engine random-init the
                # LLM in bf16 OOMs a 16 GB chip (13.2 GiB weights + KV pool +
                # init transients — observed RESOURCE_EXHAUSTED at store
                # init). Materialize the tree quantize-at-init instead, the
                # same path bench.py serves from; --quant 0 opts out (needs
                # --tp 2+).
                import jax
                import jax.numpy as jnp

                from ..models import audio_llm as _al

                quant = 8 if args.quant is None else args.quant
                self._ckpt_params = _al.init_params(
                    jax.random.PRNGKey(args.seed), self.cfg.audio_llm,
                    llm_dtype=jnp.bfloat16, quantize_llm=bool(quant),
                    quant_bits=quant or 8)
                self._ckpt_params = _al.cast_frontend(self._ckpt_params,
                                                      jnp.bfloat16)
                print(f"weightless flagship: random params, "
                      f"{'int%d weight-only' % quant if quant else 'bf16'} "
                      f"LLM", flush=True)
        if base_cfg is not None and self.cfg is not base_cfg:
            # checkpoint path set the architecture; the app YAML still governs
            # runtime behavior (VAD/gating cadence, sampling, thresholds)
            import dataclasses

            self.cfg = dataclasses.replace(self.cfg, duplex=base_cfg.duplex,
                                           sampling=base_cfg.sampling)
        if args.resp_threshold is not None:
            import dataclasses

            self.cfg = dataclasses.replace(
                self.cfg, duplex=dataclasses.replace(
                    self.cfg.duplex, resp_threshold=args.resp_threshold))
        if args.voice_wav:
            # voice prompt: derive TiCodec global-style tokens from the
            # reference wav once and bake them into the config, so every TTS
            # instance (responder, service pool) synthesizes in that voice
            import dataclasses

            from ..frontend.wav import read_wav
            from ..tts import extract_global_tokens

            tts_probe = self._ckpt_tts or self._init_tts_params(
                with_encoder=True)
            self._ckpt_tts = tts_probe  # reuse: same weights at synthesis
            vwav, vsr = read_wav(args.voice_wav)
            if vwav.ndim > 1:
                vwav = vwav.mean(axis=1)
            gst = extract_global_tokens(tts_probe["codec"],
                                        self.cfg.tts.codec, vwav, vsr)
            self.cfg = dataclasses.replace(
                self.cfg, tts=dataclasses.replace(
                    self.cfg.tts, codec=dataclasses.replace(
                        self.cfg.tts.codec, global_tokens=gst)))
            print(f"voice prompt: global tokens {gst}", flush=True)
        if args.lora:
            import jax
            import jax.numpy as jnp

            from ..models import lora as lora_mod

            tree, scale = lora_mod.load(args.lora)
            if args.lora_scale is not None:
                scale = args.lora_scale
            if self._ckpt_params is None:
                # weightless preset: materialize the params the pipeline
                # would otherwise random-init, so there is a tree to merge
                from ..models import audio_llm as _al

                dt = jnp.float32 if args.preset == "tiny" else jnp.bfloat16
                self._ckpt_params = _al.init_params(
                    jax.random.PRNGKey(args.seed), self.cfg.audio_llm,
                    llm_dtype=dt)
            self._ckpt_params["llm"] = lora_mod.merge(
                self._ckpt_params["llm"], jax.tree.map(jnp.asarray, tree),
                scale)
            print(f"merged LoRA adapter {args.lora} (scale {scale})",
                  flush=True)
        self.service = None
        if args.engine:
            import dataclasses as _dc
            import threading

            from ..runtime.service import DuplexService

            cfg = _dc.replace(self.cfg, serving=_dc.replace(
                self.cfg.serving, max_sessions=args.max_sessions,
                pipeline_ticks=bool(args.pipeline_ticks),
                kv_quant_bits=args.kv_quant or None))
            self.cfg = cfg
            svc_tts = None
            if args.respond:
                svc_tts = self._ckpt_tts or self._init_tts_params()
            mesh = None
            if self.multi:
                from ..parallel import multihost as mh

                # data axis spans hosts (KV session rows shard over DCN),
                # model stays inside each host (ICI)
                mesh = mh.make_global_mesh(("data", "model"),
                                           model_par=max(1, args.tp))
            elif args.tp > 1:
                import jax

                from ..parallel.mesh import make_mesh

                n = len(jax.devices())
                if n < args.tp:
                    raise SystemExit(
                        f"--tp {args.tp} needs {args.tp} devices, have {n}")
                mesh = make_mesh((1, args.tp), ("data", "model"),
                                 devices=jax.devices()[: args.tp])
            # full-scale serving runs half precision (bf16 KV + frontend,
            # audio_llm.cast_frontend — the f32 encoder was measured
            # tick-dominating); the tiny weightless preset stays f32 so the
            # websocket tests and the solo pipeline agree bit-for-bit
            import jax.numpy as jnp

            kv_dtype = (jnp.float32
                        if args.preset == "tiny" and not args.model_path
                        else jnp.bfloat16)
            if self.multi:
                from ..parallel import multihost as mh
                from ..runtime.engine import ServingEngine
                from ..runtime.multihost_serving import PrimaryDriver

                engine = ServingEngine(cfg, params=self._ckpt_params,
                                       tokenizer=self._tokenizer,
                                       seed=args.seed, kv_dtype=kv_dtype,
                                       mesh=mesh)
                if not mh.is_primary():
                    self.follower = (engine, svc_tts)
                    self.pipeline = None
                    return
                self.service = DuplexService(
                    cfg, engine=PrimaryDriver(engine, svc_tts),
                    seed=args.seed, tts_params=svc_tts)
            else:
                self.service = DuplexService(cfg, seed=args.seed,
                                             tts_params=svc_tts,
                                             params=self._ckpt_params,
                                             tokenizer=self._tokenizer,
                                             mesh=mesh, kv_dtype=kv_dtype)
            self.pipeline = None
            if svc_tts is not None and not args.no_tts_warmup:
                import time as _t

                t0 = _t.time()
                n = self.service.warmup_synthesis()
                print(f"synthesis pool warmup: {n} programs in "
                      f"{_t.time() - t0:.1f}s", flush=True)
            self._svc_stop = threading.Event()

            def ticker():
                import time as _time

                last_err = [0.0]

                def log_err(e):
                    now = _time.monotonic()
                    if now - last_err[0] > 5.0:  # rate-limit a poisoned tick
                        print(f"ticker error: {e!r}", file=sys.stderr)
                        last_err[0] = now

                while not self._svc_stop.is_set():
                    try:
                        worked = self.service.step()
                    except Exception as e:  # a poisoned tick must not kill
                        log_err(e)
                        worked = False
                        self._svc_stop.wait(0.25)  # backoff while failing
                    if not worked:
                        self._svc_stop.wait(0.01)

            self._ticker_thread = threading.Thread(target=ticker,
                                                    daemon=True)
            self._ticker_thread.start()
        else:
            self.pipeline = DuplexPipeline(self.cfg, seed=args.seed,
                                           params=self._ckpt_params,
                                           tokenizer=self._tokenizer)
        self.responder = None
        if args.respond and self.service is None:
            from ..duplex.responder import DuplexResponder
            from ..tts import StreamingTTS

            tts = StreamingTTS(self._ckpt_tts or self._init_tts_params(),
                               self.cfg.tts, seed=args.seed)
            self.responder = DuplexResponder(self.pipeline.core, tts, self.cfg)

    def _init_tts_params(self, with_encoder: bool = False):
        """Random-init TTS params (weightless presets only)."""
        import jax

        from ..models import codec as codec_mod
        from ..models import speech_decoder as sd

        k1, k2 = jax.random.split(jax.random.PRNGKey(self.args.seed + 7))
        return {"decoder": sd.init_params(k1, self.cfg.tts.decoder),
                "codec": codec_mod.init_params(k2, self.cfg.tts.codec,
                                               with_encoder=with_encoder)}

    async def handler(self, ws):
        from ..duplex.engine import DuplexSession
        from ..duplex.events import EventSink

        loop = asyncio.get_running_loop()
        outbox: "asyncio.Queue" = asyncio.Queue()
        sink = EventSink()
        for ev in sink.EVENTS:
            def fwd(payload, ev=ev):
                try:
                    loop.call_soon_threadsafe(
                        outbox.put_nowait, {"event": ev, **_jsonable(payload)})
                except RuntimeError:
                    pass
            sink.on(ev, fwd)

        session = None
        svc_sid = None
        sender = asyncio.create_task(self._sender(ws, outbox))
        try:
            async for raw in ws:
                msg = json.loads(raw)
                t = msg.get("type")
                if t == "start_session":
                    sid = msg.get("sid", "") or f"anon-{id(ws)}"
                    if self.service is not None:
                        if svc_sid is not None:
                            self.service.close_session(svc_sid)
                            svc_sid = None
                        try:
                            self.service.open_session(sid, sink=sink)
                        except RuntimeError as e:  # no free slots / device OOM
                            from freeze_omni_tpu.runtime.engine import \
                                CapacityError

                            err = {"event": "error", "message": str(e)}
                            if isinstance(e, CapacityError):
                                # structured capacity refusal (VERDICT r4 #5):
                                # clients can distinguish "server full, retry
                                # elsewhere/later" from a protocol error
                                err["kind"] = "capacity"
                                err["active_sessions"] = e.active_sessions
                            await ws.send(json.dumps(err))
                            continue
                        svc_sid = sid
                    else:
                        if session is not None:
                            session.release()
                        session = DuplexSession(
                            self.pipeline, self.cfg, sink=sink,
                            sid=sid, responder=self.responder)
                        session.warmup()
                        session.start()
                    await ws.send(json.dumps(
                        {"event": "session_ready", "sid": sid}))
                elif t == "audio":
                    if session is None and svc_sid is None:
                        await ws.send(json.dumps(
                            {"event": "error", "message": "no session"}))
                        continue
                    pcm = base64.b64decode(msg["pcm_b64"])
                    data = {"audio": pcm, "sr": msg.get("sr", 16000),
                            "enc": "s16le", "time_stamp": msg.get("time_stamp")}
                    if self.service is not None:
                        self.service.enqueue_audio_data(
                            svc_sid, msg["identity"], data)
                    else:
                        session.enqueue_audio_data(msg["identity"], data)
                elif t == "reset":
                    if session is not None:
                        session.reset_context()
                        await ws.send(json.dumps({"event": "reset_done"}))
                elif t == "stop":
                    break
                else:
                    await ws.send(json.dumps(
                        {"event": "error", "message": f"unknown type {t!r}"}))
        finally:
            sender.cancel()
            if session is not None:
                session.release()
            if svc_sid is not None:
                self.service.close_session(svc_sid)

    async def _sender(self, ws, outbox):
        while True:
            msg = await outbox.get()
            try:
                await ws.send(json.dumps(msg))
            except Exception:
                return

    def _start_http(self):
        """Monitoring GUI (ENHANCED_DEMO.md role) over plain HTTP."""
        import http.server
        import os
        import threading

        page = open(os.path.join(os.path.dirname(__file__),
                                 "monitor.html")).read()
        page = page.replace("window.WS_PORT || 8765",
                            str(self.args.port))

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(h):
                # serve event dumps for the GUI's ?events= replay mode:
                # basename-only .jsonl from the server's cwd (no traversal)
                path = h.path.split("?")[0]
                if path.endswith(".jsonl") and "/" not in path.strip("/"):
                    fp = os.path.join(os.getcwd(), path.strip("/"))
                    if os.path.isfile(fp):
                        h.send_response(200)
                        h.send_header("Content-Type", "application/jsonl")
                        h.end_headers()
                        with open(fp, "rb") as f:
                            h.wfile.write(f.read())
                        return
                    h.send_response(404)
                    h.end_headers()
                    return
                h.send_response(200)
                h.send_header("Content-Type", "text/html; charset=utf-8")
                h.end_headers()
                h.wfile.write(page.encode())

            def log_message(h, *a):
                pass

        srv = http.server.ThreadingHTTPServer(
            (self.args.host, self.args.http_port), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        print(f"monitor GUI on http://{self.args.host}:{self.args.http_port}",
              flush=True)

    async def run(self):
        import websockets

        if self.follower is not None:
            from ..runtime.multihost_serving import run_follower

            engine, tts = self.follower
            print(f"follower host joined (host_id="
                  f"{self.args.host_id}); replaying primary's steps",
                  flush=True)
            await asyncio.to_thread(run_follower, engine, tts)
            return
        if self.args.http_port:
            self._start_http()
        if self.args.state_dir and self.service is not None:
            import os as _os
            if _os.path.exists(_os.path.join(self.args.state_dir,
                                             "sessions.json")):
                sids = self.service.engine.restore_sessions(
                    self.args.state_dir)
                print(f"restored {len(sids)} session(s) from "
                      f"{self.args.state_dir}: {sids}", flush=True)

                async def evict_orphans(sids=sids):
                    # restored sessions whose clients never reconnect must
                    # not occupy slots forever (and be re-snapshotted at
                    # every shutdown — a capacity leak across restarts)
                    await asyncio.sleep(self.args.resume_grace)
                    for sid in sids:
                        attached = sid in self.service.sessions
                        if not attached and self.service.engine.store.has(sid):
                            self.service.engine.close_session(sid)
                            print(f"evicted unclaimed restored session "
                                  f"{sid!r} after {self.args.resume_grace:.0f}s",
                                  flush=True)

                asyncio.get_running_loop().create_task(evict_orphans())
        try:
            async with websockets.serve(self.handler, self.args.host,
                                        self.args.port):
                print(f"serving on ws://{self.args.host}:{self.args.port}",
                      flush=True)
                try:
                    if self.args.timeout:
                        await asyncio.sleep(self.args.timeout)
                    else:
                        await asyncio.Future()
                finally:
                    # inside the serve context: leaving it closes every
                    # connection, whose handlers close their sessions — the
                    # snapshot must run while they are still live. Quiesce
                    # the ticker first so no tick mutates KV mid-export.
                    if self.args.state_dir and self.service is not None:
                        self._svc_stop.set()
                        self._ticker_thread.join(timeout=30)
                        sids = self.service.engine.save_sessions(
                            self.args.state_dir)
                        print(f"snapshotted {len(sids)} session(s) to "
                              f"{self.args.state_dir}", flush=True)
        finally:
            if self.multi and self.service is not None:
                # no tick may race the stop broadcast: followers exit on stop
                # and a straggler collective would hang the primary
                self._svc_stop.set()
                self._ticker_thread.join(timeout=30)
                self.service.engine.stop()  # releases the follower loops


def _jsonable(payload: dict) -> dict:
    out = {}
    for k, v in payload.items():
        if isinstance(v, (np.floating, np.integer)):
            out[k] = v.item()
        elif isinstance(v, np.ndarray):
            if k == "pcm":  # responder audio travels as base64 s16le
                out["pcm_b64"] = base64.b64encode(
                    (np.clip(v, -1, 1) * 32767).astype("<i2").tobytes()
                ).decode()
            # other raw arrays are not rebroadcast over the event stream
        elif isinstance(v, dict):
            out[k] = _jsonable(v)
        else:
            out[k] = v
    return out


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = get_args(argv)
    from ..parallel import multihost as mh

    multi = mh.maybe_initialize_from_args(args.coordinator, args.num_hosts,
                                          args.host_id)
    asyncio.run(Server(args, multi=multi).run())
    if multi:
        mh.sync("serve-done")
        mh.shutdown()


if __name__ == "__main__":
    main()
