"""Lockstep multi-host serving: one ServingEngine spanning hosts over DCN.

The reference serves one replica per ~15 GB GPU (scripts/run_demo_server.sh:
8-9, bin/pool.py). Single-host, the TPU answer is one TP/DP-sharded resident
model (runtime/engine.py). This module extends that engine across HOSTS: KV
rows shard over a global 'data' axis (each host's HBM holds its share of the
sessions), the LLM stays tensor-parallel inside each host, and every device
step is executed by all processes — the SPMD requirement.

Mechanism: the PRIMARY host owns the sockets and all decisions. Each engine
call is serialized into a fixed-size bundle, broadcast to the FOLLOWERS
(jax.experimental.multihost_utils.broadcast_one_to_all — one DCN broadcast
per step), and then applied identically everywhere via `apply_bundle`. All
host-side engine state (slot maps, pending chunks, KV-length mirrors, RNG
streams) is deterministic given the bundle stream, so the processes never
diverge; results are fetched through the engine's replicate-then-get path and
are identical on every host.

Usage (one process per host, same config/seed/params everywhere):

    engine = ServingEngine(cfg, seed=0, mesh=mh.make_global_mesh(
        ("data", "model"), model_par=k))
    if mh.is_primary():
        drv = PrimaryDriver(engine, tts_params)   # has the engine's API
        drv.open_session("a"); drv.submit_chunk(...); drv.tick(); ...
        drv.stop()
    else:
        run_follower(engine, tts_params)          # returns on stop()
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional

import numpy as np

# size-tiered broadcast frames: every host must present identical shapes to
# the collective, so the payload rides a frame from a fixed ladder after an
# 8-byte size header round. The ladder's top (4 MiB) covers a 128-session x
# 32-frame x 80-mel dual-identity tick (~2.6 MiB of f32). A SINGLE fixed
# 4 MiB frame was measured costing 26.6 ms of per-call software overhead on
# localhost TCP (scripts/multihost_tax.py) even for ~100-byte bundles
# (open/close/embed/continue) — 12% of the 224 ms tick budget; tiering cuts
# the common case to the 64 KiB frame.
FRAME_BYTES = 1 << 22
FRAME_TIERS = (1 << 16, 1 << 19, FRAME_BYTES)


def _broadcast(obj: Optional[dict]) -> dict:
    """Two-round broadcast: an 8-byte size header picks the frame tier (the
    same on every host — shapes stay static per tier), then the payload
    frame. Primary pickles `obj`; followers pass None."""
    import jax
    from jax.experimental import multihost_utils

    is_src = jax.process_index() == 0
    if obj is not None:
        payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        if len(payload) > FRAME_BYTES:
            raise ValueError(f"bundle {len(payload)}B exceeds the "
                             f"{FRAME_BYTES}B broadcast frame")
        header = np.frombuffer(
            len(payload).to_bytes(8, "little"), np.uint8).copy()
    else:
        payload = b""
        header = np.zeros((8,), np.uint8)
    hdr = np.asarray(multihost_utils.broadcast_one_to_all(
        header, is_source=is_src))
    n = int.from_bytes(hdr.tobytes(), "little")
    tier = next(t for t in FRAME_TIERS if n <= t)
    frame = np.zeros((tier,), np.uint8)
    if obj is not None:
        frame[:n] = np.frombuffer(payload, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(
        frame, is_source=is_src))
    return pickle.loads(out[:n].tobytes())


def apply_bundle(engine, bundle: dict, tts_params: Optional[dict] = None):
    """Replay one decision bundle on the local engine replica. Ops run in a
    fixed order; every host takes the same device steps."""
    op = bundle["op"]
    if op == "open":
        return engine.open_session(bundle["sid"], role=bundle.get("role"))
    if op == "close":
        if engine.store.has(bundle["sid"]):  # idempotent under ws races
            engine.close_session(bundle["sid"])
        return None
    if op == "tick":
        for sid, identity, chunk, is_sl in bundle["submits"]:
            # a buffered submit may outlive its session (closed between
            # submit and tick); the store state is identical on every host,
            # so skipping here is deterministic
            if engine.store.has(sid):
                engine.submit_chunk(sid, identity, chunk, is_sl)
        return engine.tick()
    if op == "respond":
        if tts_params is None:
            raise RuntimeError("respond bundle but this host has no "
                               "tts_params")
        return engine.respond_fast_many(bundle["sids"], tts_params,
                                        n_text=bundle["n_text"])
    if op == "continue":
        return engine.continue_segments(bundle["last_tokens"],
                                        n_steps=bundle["n_steps"])
    if op == "embed":
        # sentence-TTS re-embed: a collective on the global-mesh embedding
        # table; the primary uses the result, followers just participate
        return engine.embed_tokens(bundle["ids"])
    if op == "export":
        # the row fetch is a collective on multi-host meshes: every host
        # participates and gets the identical blob
        return engine.export_session(bundle["sid"])
    if op == "import":
        return engine.import_session(bundle["sid"], bundle["blob"])
    if op == "stop":
        return None
    raise ValueError(f"unknown bundle op {op!r}")


class PrimaryDriver:
    """The engine's serving API, with every call broadcast before it runs.
    Mirrors the surface runtime/service.DuplexService uses, so a DuplexService
    constructed with engine=PrimaryDriver(...) serves multi-host unchanged."""

    def __init__(self, engine, tts_params: Optional[dict] = None):
        import threading

        self.engine = engine
        self.tts_params = tts_params
        self.core = engine.core
        self.store = engine.store
        self.cfg = engine.cfg
        self._submits: List[tuple] = []
        # broadcast+apply is atomic: callers live on several threads (ticker,
        # websocket loop), but followers replay bundles strictly in broadcast
        # order — the primary's device-op order must match it exactly
        self._lock = threading.Lock()

    # -- session management -------------------------------------------
    def open_session(self, sid: str, role: Optional[str] = None,
                     on_prediction=None) -> int:
        slot = self._run({"op": "open", "sid": sid, "role": role})
        if on_prediction is not None:
            # callbacks are primary-only (they drive sockets); registered
            # outside the broadcast so followers never see them
            self.engine._callbacks[slot] = on_prediction
        return slot

    def close_session(self, sid: str) -> None:
        self._run({"op": "close", "sid": sid})

    def embed_tokens(self, ids):
        return self._run({"op": "embed", "ids": [int(t) for t in ids]})

    def export_session(self, sid: str) -> dict:
        return self._run({"op": "export", "sid": sid})

    def import_session(self, sid: str, blob: dict,
                       on_prediction=None) -> int:
        """The blob rides the broadcast frame (FRAME_BYTES cap): fine for
        tiny/test configs; flagship KV rows exceed it — migrate those through
        a single-host engine or raise the frame size."""
        slot = self._run({"op": "import", "sid": sid, "blob": blob})
        if on_prediction is not None:
            self.engine._callbacks[slot] = on_prediction
        return slot

    @property
    def num_active(self) -> int:
        return self.engine.num_active

    # -- serving -------------------------------------------------------
    def submit_chunk(self, sid: str, identity: str, fbank_chunk, is_sl: bool
                     ) -> None:
        """Host-only buffering; chunks ride the next tick's bundle."""
        with self._lock:
            self._submits.append((sid, identity,
                                  np.asarray(fbank_chunk, np.float32),
                                  bool(is_sl)))

    def tick(self):
        with self._lock:
            submits, self._submits = self._submits, []
            return self._run_locked({"op": "tick", "submits": submits})

    def respond_fast_many(self, sids: List[str], tts_params=None,
                          n_text: int = 8, rng=None):
        # tts_params/rng ride each host's local state (identical by
        # construction); only the decision crosses DCN
        return self._run({"op": "respond", "sids": list(sids),
                          "n_text": n_text})

    def respond_fast(self, sid: str, tts_params=None, n_text: int = 8,
                     rng=None):
        return self.respond_fast_many([sid], n_text=n_text)[sid]

    def continue_segments(self, last_tokens: Dict[str, int],
                          n_steps: int = 16, rng=None):
        return self._run({"op": "continue", "last_tokens": dict(last_tokens),
                          "n_steps": n_steps})

    def stop(self) -> None:
        with self._lock:
            _broadcast({"op": "stop"})

    def _run(self, bundle: dict):
        with self._lock:
            return self._run_locked(bundle)

    def _run_locked(self, bundle: dict):
        _broadcast(bundle)
        return apply_bundle(self.engine, bundle, self.tts_params)


def run_follower(engine, tts_params: Optional[dict] = None) -> None:
    """Participate in every device step the primary decides; returns when the
    primary broadcasts stop.

    A bundle that raises a PYTHON-level engine error does so
    DETERMINISTICALLY on every host (e.g. open_session on a full store raises
    before any state mutation), so the primary's caller sees the error while
    engine state stays identical everywhere — the follower logs and keeps
    serving. A device/runtime-layer failure (XLA error, transfer failure,
    OOM) is HOST-LOCAL and may leave this replica's state diverged mid-ops:
    continuing would silently compute on diverged KV — re-raise and die
    loudly instead (the operator restarts the deployment)."""
    import sys

    while True:
        bundle = _broadcast(None)
        if bundle["op"] == "stop":
            return
        try:
            apply_bundle(engine, bundle, tts_params)
        except Exception as e:  # noqa: BLE001 — filtered below
            mod = type(e).__module__ or ""
            if "Xla" in type(e).__name__ or mod.startswith(("jax", "jaxlib")):
                raise
            print(f"follower: bundle {bundle.get('op')!r} raised "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
