"""Size the lockstep multi-host serving tax (VERDICT r4 weak #7 / next #8).

Every engine call in runtime/multihost_serving.py broadcasts one fixed
FRAME_BYTES (4 MiB) pickle frame before the SPMD step runs. This harness
measures, on a 2-process CPU mesh over localhost:

  1. the raw broadcast cost alone (p50 over K empty-bundle broadcasts), and
  2. the full per-tick cost at serving shape (N sessions, dual-identity
     chunks riding the tick bundle),

so the DCN extrapolation in the bench artifact is anchored to a measured
serialization + collective number instead of a guess. Localhost TCP is the
pessimistic floor for the software overhead (pickle + frame copy + gRPC);
real DCN adds wire time ~= FRAME_BYTES / per-host DCN bandwidth
(4 MiB @ 100 Gb/s ~= 0.34 ms) + RTT.

Usage (the bench's --phase multihost runs both):
    python scripts/multihost_tax.py <coordinator> <host_id> <streams> <ticks>
Host 0 prints one `RESULT {json}` line.
"""

import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses as dc  # noqa: E402

import numpy as np  # noqa: E402


def serving_cfg(streams: int):
    from freeze_omni_tpu.config import tiny_system

    cfg = tiny_system()
    return dc.replace(
        cfg,
        audio_llm=dc.replace(
            cfg.audio_llm,
            llm=dc.replace(cfg.audio_llm.llm, num_kv_heads=2)),
        serving=dc.replace(cfg.serving, max_sessions=streams))


def main():
    coordinator, host_id = sys.argv[1], int(sys.argv[2])
    streams, ticks = int(sys.argv[3]), int(sys.argv[4])
    from freeze_omni_tpu.parallel import multihost as mh

    mh.initialize(coordinator, 2, host_id)
    from freeze_omni_tpu.runtime import multihost_serving as ms
    from freeze_omni_tpu.runtime.engine import ServingEngine

    mesh = mh.make_global_mesh(("data", "model"), model_par=2)
    cfg = serving_cfg(streams)
    engine = ServingEngine(cfg, seed=0, mesh=mesh)
    rng = np.random.RandomState(0)
    frames = cfg.duplex.gating.frames_per_step
    chunks = [rng.randn(1, frames, 80).astype(np.float32)
              for _ in range(streams)]

    if mh.is_primary():
        drv = ms.PrimaryDriver(engine)
        for i in range(streams):
            drv.open_session(f"s{i}")

        def tick(is_sl):
            for i in range(streams):
                drv.submit_chunk(f"s{i}", "user", chunks[i], is_sl)
                drv.submit_chunk(f"s{i}", "system", chunks[i], is_sl)
            t0 = time.perf_counter()
            drv.tick()
            return (time.perf_counter() - t0) * 1e3

        tick(True)
        tick(False)  # warmup/compile
        tick_ms = [tick(False) for _ in range(ticks)]

        # raw broadcast floor: an empty bundle still ships the full frame.
        # 'embed' with one id is the lightest op that exists on both sides.
        def bc():
            t0 = time.perf_counter()
            drv.embed_tokens([1])
            return (time.perf_counter() - t0) * 1e3
        bc()
        bc_ms = [bc() for _ in range(30)]

        # the tick bundle's actual serialized size at this serving shape
        import pickle
        bundle = {"op": "tick",
                  "submits": [(f"s{i}", ident, chunks[i], False)
                              for i in range(streams)
                              for ident in ("user", "system")]}
        payload = len(pickle.dumps(bundle, protocol=pickle.HIGHEST_PROTOCOL))

        drv.stop()
        result = {
            "streams": streams,
            "frame_bytes": ms.FRAME_BYTES,
            "tick_bundle_payload_bytes": payload,
            "lockstep_tick_p50_ms": round(float(np.median(tick_ms)), 2),
            "broadcast_call_p50_ms": round(float(np.median(bc_ms)), 2),
        }
        print("RESULT " + json.dumps(result), flush=True)
    else:
        ms.run_follower(engine)
    mh.sync("tax-done")
    mh.shutdown()


if __name__ == "__main__":
    main()
