"""Child process for tests/test_multihost.py::test_lockstep_serving.

One process per 'host'. Host 0 drives a PrimaryDriver through opens, two
ticks (dual-identity), a continuation segment, and a close; host 1 replays
the same device steps via run_follower. Both print the user predictions they
observed — the parent asserts they are identical and match a single-process
engine run of the same chunk schedule.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses as dc  # noqa: E402

import numpy as np  # noqa: E402


def tiny_serving_cfg():
    from freeze_omni_tpu.config import tiny_system

    cfg = tiny_system()
    return dc.replace(
        cfg,
        audio_llm=dc.replace(
            cfg.audio_llm,
            llm=dc.replace(cfg.audio_llm.llm, num_kv_heads=2)),
        serving=dc.replace(cfg.serving, max_sessions=4))


def chunk(seed):
    return np.random.RandomState(seed).randn(1, 32, 80).astype(np.float32)


def drive(drv, tts):
    """The chunk schedule both the multi-host and the single-process runs
    execute: 4 sessions, an sl tick, a dual-identity tick, a continuation,
    a batched fast response + sentence-TTS re-embed, overflow, migration."""
    for i in range(4):
        drv.open_session(f"s{i}")
    for i in range(4):
        drv.submit_chunk(f"s{i}", "user", chunk(i), True)
    out1 = drv.tick()
    for i in range(4):
        drv.submit_chunk(f"s{i}", "user", chunk(10 + i), False)
        drv.submit_chunk(f"s{i}", "system", chunk(20 + i), i == 0)
    out2 = drv.tick()
    cont = drv.continue_segments({f"s{i}": 5 for i in range(4)}, n_steps=4)
    # full speech-to-speech lockstep: batched fast response (decoder+vocoder
    # on host-local tts params) and the sentence-TTS re-embed collective
    resp = drv.respond_fast_many(["s0", "s1"], tts, n_text=4)
    emb = drv.embed_tokens([3, 1, 4, 1, 5])
    drv.close_session("s3")
    # liveness under deterministic engine errors: the store is back at 3/4 —
    # fill it, then overflow. The overflow raises on EVERY host identically;
    # the follower must keep serving (a dead follower hangs the next
    # broadcast forever).
    drv.open_session("s4")
    try:
        drv.open_session("s5")
        overflow = "no-error"
    except RuntimeError:
        overflow = "raised"
    drv.close_session("s4")
    drv.open_session("s6")        # proves both hosts still serve opens
    drv.submit_chunk("s6", "user", chunk(30), True)
    out3 = drv.tick()
    # migration over the bundle path: the export fetch is a collective (every
    # host participates), the import scatter is SPMD
    blob = drv.export_session("s0")
    drv.close_session("s0")
    slot = drv.import_session("s0", blob)
    drv.submit_chunk("s0", "user", chunk(31), False)
    out4 = drv.tick()
    migrated = out4["user"][slot]
    return {
        "tick1": {str(k): v for k, v in out1["user"].items()},
        "tick2": {str(k): v for k, v in out2["user"].items()},
        "cont_tokens": {s: t for s, (t, _, _) in cont.items()},
        "overflow": overflow,
        "tick3": {str(k): v for k, v in out3["user"].items()},
        "migrated": migrated,
        "resp_tokens": {s: list(map(int, t)) for s, (_, t) in resp.items()},
        "resp_pcm_sum": {s: float(np.abs(p).sum()) for s, (p, _) in
                         resp.items()},
        "embed_sum": float(np.abs(emb).sum()),
    }


def tiny_tts_params(cfg):
    import jax

    from freeze_omni_tpu.models import codec as codec_mod
    from freeze_omni_tpu.models import speech_decoder as sd

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    return {"decoder": sd.init_params(k1, cfg.tts.decoder),
            "codec": codec_mod.init_params(k2, cfg.tts.codec)}


def main():
    coordinator, host_id = sys.argv[1], int(sys.argv[2])
    from freeze_omni_tpu.parallel import multihost as mh

    mh.initialize(coordinator, 2, host_id)
    from freeze_omni_tpu.runtime import multihost_serving as ms
    from freeze_omni_tpu.runtime.engine import ServingEngine

    mesh = mh.make_global_mesh(("data", "model"), model_par=2)
    cfg = tiny_serving_cfg()
    engine = ServingEngine(cfg, seed=0, mesh=mesh)
    tts = tiny_tts_params(cfg)
    if mh.is_primary():
        drv = ms.PrimaryDriver(engine, tts)
        result = drive(drv, tts)
        drv.stop()
    else:
        # followers observe the same device results through the engine's
        # callback-free path; replay and report the KV-length mirror as the
        # divergence probe
        ms.run_follower(engine, tts)
        result = {"len_host": [int(x) for x in engine._len_host]}
    result["host_id"] = host_id
    if mh.is_primary():
        result["len_host"] = [int(x) for x in engine._len_host]
    print("RESULT " + json.dumps(result), flush=True)
    mh.sync("serving-done")
    mh.shutdown()


if __name__ == "__main__":
    main()
