"""Drive the duplex websocket server over a real socket."""

import asyncio
import base64
import json
import threading
import time

import numpy as np
import pytest


def test_server_session_over_websocket(unused_port=8971):
    websockets = pytest.importorskip("websockets")

    from freeze_omni_tpu.bin.serve import Server, get_args

    args = get_args(["--preset", "tiny", "--port", str(unused_port),
                     "--timeout", "90"])
    server = Server(args)

    def run():
        asyncio.run(server.run())

    t = threading.Thread(target=run, daemon=True)
    t.start()

    async def connect_with_retry(url, deadline_s=60.0):
        """Deterministic readiness: retry until the server accepts, instead
        of a fixed sleep (the engine boot time varies under suite load)."""
        import websockets

        deadline = time.time() + deadline_s
        while True:
            try:
                return await websockets.connect(url, open_timeout=10)
            except OSError:
                if time.time() > deadline:
                    raise
                await asyncio.sleep(0.25)

    async def client():
        import websockets

        sr = 16000
        n = server.cfg.duplex.gating.samples_per_chunk
        quiet = np.zeros(2 * n, np.float32)
        from freeze_omni_tpu.training.vad import synth_speech
        speech = 0.5 * synth_speech(np.random.RandomState(7), 3 * n)

        def b64(x):
            return base64.b64encode(
                (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()).decode()

        events = []
        async with await connect_with_retry(
                f"ws://127.0.0.1:{unused_port}") as ws:
            await ws.send(json.dumps({"type": "start_session", "sid": "t1"}))
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), 60))
                if msg["event"] == "session_ready":
                    break
            for chunk in (quiet, speech, np.zeros(4 * n)):
                await ws.send(json.dumps({
                    "type": "audio", "identity": "user",
                    "pcm_b64": b64(chunk), "sr": sr}))
            deadline = time.time() + 45
            while time.time() < deadline:
                try:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 5))
                except asyncio.TimeoutError:
                    continue
                events.append(msg)
                names = {e["event"] for e in events}
                if "dialog_state_update" in names and any(
                        e.get("status") == "ipu_el" for e in events):
                    break
            # probe: malformed message type. Queued vad/dialog events for
            # the remaining audio may still be streaming in — scan for the
            # error reply with a deadline instead of asserting on whatever
            # message happens to arrive next (flaked under full-suite load)
            await ws.send(json.dumps({"type": "bogus"}))
            deadline = time.time() + 30
            while time.time() < deadline:
                try:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 5))
                except asyncio.TimeoutError:
                    continue
                events.append(msg)
                if msg["event"] == "error":
                    break
            await ws.send(json.dumps({"type": "stop"}))
        return events

    events = asyncio.run(client())
    names = [e["event"] for e in events]
    assert "vad_event" in names
    assert "dialog_state_update" in names
    assert any(e.get("status") == "ipu_sl" for e in events)
    upd = [e for e in events if e["event"] == "dialog_state_update"][0]
    assert 0.0 <= upd["probs"]["state_1"] <= 1.0
    err = [e for e in events if e["event"] == "error"]
    assert err and "bogus" in err[0]["message"]


def test_client_cli_against_live_responding_server(tmp_path,
                                                   unused_port=8973):
    """bin/client.py drives a real server end-to-end: stream a wav at
    accelerated cadence, receive dialog events and the spoken response, write
    the reply wav."""
    pytest.importorskip("websockets")

    from freeze_omni_tpu.bin.client import main as client_main
    from freeze_omni_tpu.bin.serve import Server, get_args
    from freeze_omni_tpu.frontend.wav import read_wav, write_wav
    from freeze_omni_tpu.training.vad import synth_speech

    args = get_args(["--preset", "tiny", "--port", str(unused_port),
                     "--timeout", "120", "--engine", "--respond",
                     "--resp_threshold", "0.0"])
    server = Server(args)
    t = threading.Thread(target=lambda: asyncio.run(server.run()),
                         daemon=True)
    t.start()
    time.sleep(1.0)

    n = server.cfg.duplex.gating.samples_per_chunk
    wav = np.concatenate([
        np.zeros(2 * n, np.float32),
        0.5 * synth_speech(np.random.RandomState(7), 4 * n),
        np.zeros(3 * n, np.float32)])
    inp = tmp_path / "in.wav"
    out = tmp_path / "out.wav"
    write_wav(str(inp), wav, 16000)

    stats = client_main(["--url", f"ws://127.0.0.1:{unused_port}",
                         "--input_wav", str(inp), "--output_wav", str(out),
                         "--speed", "8", "--listen_s", "6"])
    assert stats["events"].get("dialog_state_update", 0) >= 1
    assert stats["events"].get("vad_event", 0) >= 1
    # resp_threshold 0.0: the first user prediction triggers a spoken reply
    assert stats["texts"], f"no response_text; events={stats['events']}"
    assert stats["responses"], f"no response_audio; events={stats['events']}"
    reply, sr = read_wav(str(out))
    assert reply.size > 0 and sr in (16000, 24000)
