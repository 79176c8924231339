#!/usr/bin/env python
"""Websocket load driver for the duplex server.

Opens N concurrent sessions against `bin/serve.py`, streams synthetic
voiced speech (the VAD-training speech surrogate) at real-time cadence, and
reports per-session event counts and decision latency percentiles.

    python scripts/load_test.py --url ws://127.0.0.1:8765 --sessions 8 \
        --seconds 20

Requires a running server, e.g.:
    python -m freeze_omni_tpu.bin.serve --engine --respond \
        --resp_threshold 0.0 --preset tiny --port 8765
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CHUNK = 3584  # 224 ms @ 16 kHz


def make_audio(seed: int, seconds: float):
    """Quiet lead-in, voiced-speech surrogate, quiet tail — per second."""
    from freeze_omni_tpu.training.vad import synth_speech

    rs = np.random.RandomState(seed)
    n = int(seconds * 16000)
    audio = np.zeros(n, np.float32)
    t = CHUNK * 2
    while t + 4 * CHUNK < n:
        audio[t: t + 4 * CHUNK] = 0.6 * synth_speech(rs, 4 * CHUNK)
        t += 10 * CHUNK  # speak ~0.9 s of every ~2.2 s
    return audio


async def client(url: str, name: str, seconds: float, results: dict,
                 event_log: list = None):
    import websockets

    events, lat = [], []
    last_send = [0.0]
    async with websockets.connect(url, max_size=None,
                                  open_timeout=300) as ws:
        await ws.send(json.dumps({"type": "start_session", "sid": name}))

        async def reader():
            try:
                while True:
                    msg = json.loads(await ws.recv())
                    ev = msg.get("event")
                    events.append(ev)
                    if event_log is not None:
                        # full event, tagged with the session + arrival time,
                        # for the monitor GUI's timeline replay (drop pcm
                        # payloads — the timelines only need timings)
                        rec = {k: v for k, v in msg.items() if k != "pcm_b64"}
                        rec["sid"] = name
                        rec.setdefault("time_stamp", time.time())
                        event_log.append(rec)
                    if ev == "dialog_state_update" and last_send[0]:
                        # approximate decision latency: arrival relative to
                        # the most recent chunk send (server does not echo
                        # client timestamps)
                        lat.append(time.time() - last_send[0])
            except Exception:
                pass

        rt = asyncio.create_task(reader())
        audio = make_audio(abs(hash(name)) % 2**31, seconds)
        for i in range(0, len(audio) - CHUNK, CHUNK):
            s16 = (np.clip(audio[i: i + CHUNK], -1, 1)
                   * 32767).astype("<i2").tobytes()
            last_send[0] = time.time()
            await ws.send(json.dumps({
                "type": "audio", "identity": "user",
                "pcm_b64": base64.b64encode(s16).decode()}))
            await asyncio.sleep(CHUNK / 16000)  # real-time cadence
        await asyncio.sleep(3.0)  # drain
        rt.cancel()
    results[name] = (events, lat)


async def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="ws://127.0.0.1:8765")
    p.add_argument("--sessions", type=int, default=4)
    p.add_argument("--seconds", type=float, default=15.0)
    p.add_argument("--events_out", default=None, metavar="FILE.jsonl",
                   help="dump every received event (tagged with sid) as JSON "
                        "lines; load the file in monitor.html to replay the "
                        "run as per-session timelines")
    args = p.parse_args()

    results: dict = {}
    event_log: list = [] if args.events_out else None
    await asyncio.gather(*[
        client(args.url, f"load-{i}", args.seconds, results, event_log)
        for i in range(args.sessions)])
    if args.events_out:
        with open(args.events_out, "w") as f:
            for rec in sorted(event_log, key=lambda r: r["time_stamp"]):
                f.write(json.dumps(rec) + "\n")
        print(f"{len(event_log)} events -> {args.events_out}")

    from collections import Counter

    all_lat = []
    ok = True
    for name, (events, lat) in sorted(results.items()):
        c = Counter(events)
        all_lat += lat
        good = c.get("dialog_state_update", 0) > 0
        ok &= good
        print(f"{name}: {dict(c)}  {'OK' if good else 'NO PREDICTIONS'}")
    if all_lat:
        q = np.percentile(all_lat, [50, 90, 99]) * 1e3
        print(f"decision latency ms (last chunk send -> dialog_state_update): "
              f"p50={q[0]:.0f} p90={q[1]:.0f} p99={q[2]:.0f} "
              f"n={len(all_lat)}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    asyncio.run(main())
