import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freeze_omni_tpu.config import tiny_system
from freeze_omni_tpu.models import audio_llm
from freeze_omni_tpu.pipeline import DuplexPipeline
from freeze_omni_tpu.runtime.engine import PipelinePool, ServingEngine
from freeze_omni_tpu.runtime.session import SessionStore


def _chunks(seed, n, t=32):
    rng = np.random.RandomState(seed)
    return [rng.randn(1, t, 80).astype(np.float32) for _ in range(n)]


class TestSessionStore:
    def test_alloc_free_reset(self):
        cfg = tiny_system()
        store = SessionStore(cfg.audio_llm, max_sessions=2)
        a = store.alloc("a")
        b = store.alloc("b")
        assert {a, b} == {0, 1}
        with pytest.raises(RuntimeError):
            store.alloc("c")
        store.free("a")
        c = store.alloc("c")
        assert c == a
        assert store.kv_length(c) == 0

    def test_scatter_kv_many_bucket_padding_and_row_selection(self):
        """scatter_kv_many pads idx/r to the kv bucket size (one compiled
        program per bucket, duplicate writes carry identical data) and honors
        `rows` selection — untargeted slots must be untouched, dropped rows
        must not land anywhere."""
        cfg = tiny_system()
        store = SessionStore(cfg.audio_llm, max_sessions=4)
        for sid in "abcd":
            store.alloc(sid)
        before = jax.tree.map(np.asarray, store.caches.kv)

        # batch-4 bucket (pow-2 padded), but only rows 0 and 2 should land,
        # into slots 3 and 1 respectively
        rng = np.random.RandomState(0)
        bucket = jax.tree.map(
            lambda leaf, ax: jnp.asarray(rng.randn(
                *(s if i != ax else 4 for i, s in enumerate(leaf.shape))
            ).astype(np.asarray(leaf).dtype)) if leaf.dtype.kind == "f"
            else jnp.asarray(rng.randint(
                0, 7, tuple(s if i != ax else 4
                            for i, s in enumerate(leaf.shape))
            ).astype(np.asarray(leaf).dtype)),
            before, type(before)(k=1, v=1, length=0))
        store.scatter_kv_many([3, 1], bucket, rows=[0, 2])

        after = jax.tree.map(np.asarray, store.caches.kv)
        np.testing.assert_array_equal(after.k[:, 3], np.asarray(bucket.k)[:, 0])
        np.testing.assert_array_equal(after.v[:, 1], np.asarray(bucket.v)[:, 2])
        assert after.length[3] == np.asarray(bucket.length)[0]
        assert after.length[1] == np.asarray(bucket.length)[2]
        for untouched in (0, 2):
            np.testing.assert_array_equal(after.k[:, untouched],
                                          before.k[:, untouched])
            np.testing.assert_array_equal(after.v[:, untouched],
                                          before.v[:, untouched])
            assert after.length[untouched] == before.length[untouched]


class TestServingEngine:
    def test_batched_sessions_match_solo_pipeline(self):
        """Two sessions with staggered chunk arrival through the continuous-
        batching engine must produce the same state probabilities as each
        session alone through the plain pipeline (same params)."""
        cfg = tiny_system()
        engine = ServingEngine(cfg, seed=0)
        role = "Batching parity test."
        engine.open_session("s1", role=role)
        engine.open_session("s2", role=role)

        a_chunks = _chunks(1, 3)
        b_chunks = _chunks(2, 2)

        engine.submit_chunk("s1", "user", a_chunks[0], is_sl=True)
        r1 = engine.tick()["user"]
        engine.submit_chunk("s1", "user", a_chunks[1], is_sl=False)
        engine.submit_chunk("s2", "user", b_chunks[0], is_sl=True)
        r2 = engine.tick()["user"]
        engine.submit_chunk("s1", "user", a_chunks[2], is_sl=False)
        engine.submit_chunk("s2", "user", b_chunks[1], is_sl=False)
        r3 = engine.tick()["user"]

        s1 = engine.store.slot_of("s1")
        s2 = engine.store.slot_of("s2")
        got_s1 = [r1[s1], r2[s1], r3[s1]]
        got_s2 = [r2[s2], r3[s2]]

        # solo reference runs with the same params
        pipe = DuplexPipeline(cfg, core=engine.core)
        for chunks, got in ((a_chunks, got_s1), (b_chunks, got_s2)):
            _, kv, adp, enc, pe = pipe.speech_dialogue(
                None, identity="", status="pre", role=role)
            for i, (c, g) in enumerate(zip(chunks, got)):
                pred, kv, adp, enc, pe = pipe.speech_dialogue(
                    c, "user", "ipu_sl" if i == 0 else "ipu_cl",
                    past_key_values=kv, adapter_cache=adp,
                    encoder_cache=enc, pe_index=pe)
                assert abs(pred["state_1"] - g["state_1"]) < 1e-4, (i, pred, g)
                assert abs(pred["state_2"] - g["state_2"]) < 1e-4

    def test_both_identities_and_close(self):
        cfg = tiny_system()
        engine = ServingEngine(cfg, seed=0)
        engine.open_session("s1")
        len0 = engine.store.kv_length(engine.store.slot_of("s1"))
        engine.submit_chunk("s1", "user", _chunks(3, 1)[0], is_sl=True)
        engine.submit_chunk("s1", "system", _chunks(4, 1)[0], is_sl=True)
        out = engine.tick()
        assert "user" in out and "system" not in out  # system: no predictions
        grew = engine.store.kv_length(engine.store.slot_of("s1")) - len0
        # user prefix + 4 + system prefix + 4
        core = engine.core
        assert grew == 8 + len(core.chat.user_prefix_ids) + \
            len(core.chat.system_prefix_ids)
        engine.close_session("s1")
        assert engine.num_active == 0

    def test_callbacks(self):
        cfg = tiny_system()
        engine = ServingEngine(cfg, seed=0)
        seen = []
        engine.open_session("s1", on_prediction=lambda ident, p: seen.append(p))
        engine.submit_chunk("s1", "user", _chunks(5, 1)[0], is_sl=True)
        engine.tick()
        assert len(seen) == 1 and 0 <= seen[0]["state_1"] <= 1

    def test_pipelined_ticks_match_sync(self):
        """Double-buffered dispatch (tick_submit + late deliver) must produce
        exactly the sync tick()'s predictions: same compiled programs, same
        inputs — only the fetch point moves."""
        def drive(pipelined: bool):
            engine = ServingEngine(tiny_system(), seed=0)
            for sid in ("a", "b"):
                engine.open_session(sid)
            u = _chunks(11, 4)
            s = _chunks(12, 4)
            outs = []
            prev = None
            for i in range(4):
                engine.submit_chunk("a", "user", u[i], is_sl=(i == 0))
                if i != 1:  # staggered arrival for b
                    engine.submit_chunk("b", "user", s[i], is_sl=(i == 0))
                if i % 2 == 0:  # some ticks are full-duplex (fused path)
                    engine.submit_chunk("a", "system", s[i], is_sl=(i == 0))
                    engine.submit_chunk("b", "system", u[i], is_sl=(i == 0))
                if pipelined:
                    h = engine.tick_submit()
                    if prev is not None:
                        outs.append(prev.deliver())
                    prev = h
                else:
                    outs.append(engine.tick())
            if prev is not None:
                outs.append(prev.deliver())
            flat = [(i, slot, p["state_1"], p["state_2"])
                    for i, r in enumerate(outs)
                    for slot, p in sorted(r.get("user", {}).items())]
            return flat, engine

        sync, e_sync = drive(False)
        pip, e_pip = drive(True)
        assert [x[1:] for x in sync] == [x[1:] for x in pip]
        # and the device KV advanced identically
        for sid in ("a", "b"):
            assert e_sync.store.kv_length(e_sync.store.slot_of(sid)) == \
                e_pip.store.kv_length(e_pip.store.slot_of(sid))

    def test_mirror_accounting_is_exact(self):
        """The host KV-length mirror (advanced at submit time, never
        refreshed from a fetch) must track the device lengths exactly across
        user/system/dual ticks and rolls."""
        engine = ServingEngine(tiny_system(), seed=0)
        for sid in ("a", "b"):
            engine.open_session(sid)
        u = _chunks(13, 6)
        s = _chunks(14, 6)
        prev = None
        for i in range(6):
            engine.submit_chunk("a", "user", u[i], is_sl=(i % 3 == 0))
            if i % 2 == 0:
                engine.submit_chunk("b", "user", s[i], is_sl=(i % 4 == 0))
            if i % 3 == 1:  # system-only and dual ticks both covered
                engine.submit_chunk("a", "system", s[i], is_sl=(i == 1))
                engine.submit_chunk("b", "system", u[i], is_sl=(i == 1))
            h = engine.tick_submit()
            if prev is not None:
                prev.deliver()
            prev = h
        prev.deliver()
        device_len = np.asarray(engine.store.caches.kv.length)
        assert engine._len_host is not None
        np.testing.assert_array_equal(engine._len_host, device_len)


class TestShardedServing:
    def test_engine_with_tensor_parallel_mesh(self):
        """The serving engine on a ('data','model') mesh must produce the same
        predictions as the unsharded engine (XLA inserts the collectives)."""
        from freeze_omni_tpu.parallel.mesh import make_mesh

        cfg = tiny_system()  # llm num_kv_heads=2 -> model axis 2
        mesh = make_mesh((1, 2), ("data", "model"))
        engine = ServingEngine(cfg, seed=0, mesh=mesh)
        plain = ServingEngine(cfg, seed=0)

        for e in (engine, plain):
            e.open_session("s1", role="TP parity.")
        chunks = _chunks(7, 2)
        results = []
        for e in (engine, plain):
            out = []
            for i, c in enumerate(chunks):
                e.submit_chunk("s1", "user", c, is_sl=(i == 0))
                out.append(e.tick()["user"][e.store.slot_of("s1")])
            results.append(out)
        for a, b in zip(*results):
            assert abs(a["state_1"] - b["state_1"]) < 2e-3, (a, b)

    def test_engine_with_quantized_tensor_parallel(self):
        """int8 weight-only x TP (VERDICT r2 #6): the quantized tree shards
        through the same PartitionSpec derivation (parallel/mesh._linear_spec
        matches w_q/scale layouts) and serves with the same predictions as
        the unsharded quantized engine."""
        import jax
        import jax.numpy as jnp

        from freeze_omni_tpu.models import audio_llm
        from freeze_omni_tpu.parallel.mesh import make_mesh

        cfg = tiny_system()

        def build(mesh):
            params = audio_llm.init_params(
                jax.random.PRNGKey(0), cfg.audio_llm,
                llm_dtype=jnp.bfloat16, quantize_llm=True)
            return ServingEngine(cfg, params=params, seed=0,
                                 kv_dtype=jnp.bfloat16, mesh=mesh)

        engine = build(make_mesh((1, 2), ("data", "model")))
        plain = build(None)
        for e in (engine, plain):
            e.open_session("s1", role="int8 TP parity.")
        chunks = _chunks(5, 2)
        results = []
        for e in (engine, plain):
            out = []
            for i, c in enumerate(chunks):
                e.submit_chunk("s1", "user", c, is_sl=(i == 0))
                out.append(e.tick()["user"][e.store.slot_of("s1")])
            results.append(out)
        for a, b in zip(*results):
            # bf16 activations: collectives reorder reductions
            assert abs(a["state_1"] - b["state_1"]) < 3e-2, (a, b)

    def test_quantized_specs_match_tree_structure(self):
        """llm_param_specs(cfg, params) must mirror the int8 AND int4 tree
        structures exactly (shard_tree tree.maps them together)."""
        import jax

        from freeze_omni_tpu.config import LLMConfig
        from freeze_omni_tpu.models import qwen2
        from freeze_omni_tpu.ops.quant import quantize_llm_params
        from freeze_omni_tpu.parallel.mesh import llm_param_specs

        cfg = LLMConfig(hidden=64, num_layers=2, num_heads=4, num_kv_heads=2,
                        ffn=128, vocab_size=128, max_kv_len=32)
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
        for bits in (8, 4):
            q = quantize_llm_params(params, bits=bits)
            specs = llm_param_specs(cfg, q)
            assert jax.tree.structure(q) == jax.tree.structure(
                specs, is_leaf=lambda x: not isinstance(x, dict))
        # bf16 default still matches the plain tree
        specs = llm_param_specs(cfg, params)
        assert jax.tree.structure(params) == jax.tree.structure(
            specs, is_leaf=lambda x: not isinstance(x, dict))
        assert jax.tree.structure(params) == jax.tree.structure(
            llm_param_specs(cfg), is_leaf=lambda x: not isinstance(x, dict))


class TestEngineRespond:
    def test_respond_on_slot_advances_kv(self):
        import jax

        from freeze_omni_tpu.duplex.responder import DuplexResponder
        from freeze_omni_tpu.models import codec as codec_mod
        from freeze_omni_tpu.models import speech_decoder as sd
        from freeze_omni_tpu.tts import StreamingTTS

        cfg = dataclasses.replace(
            tiny_system(),
            tts=dataclasses.replace(tiny_system().tts, max_tokens=16))
        engine = ServingEngine(cfg, seed=0)
        engine.open_session("s1")
        engine.submit_chunk("s1", "user", _chunks(11, 1)[0], is_sl=True)
        engine.tick()
        slot = engine.store.slot_of("s1")
        before = engine.store.kv_length(slot)

        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        tts = StreamingTTS({"decoder": sd.init_params(k1, cfg.tts.decoder),
                            "codec": codec_mod.init_params(k2, cfg.tts.codec)},
                           cfg.tts)
        responder = DuplexResponder(engine.core, tts, cfg, max_tokens=8,
                                    segment=8)
        out = engine.respond("s1", responder)
        assert len(out) >= 1
        text, pcm = out[0]
        assert isinstance(text, str)
        after = engine.store.kv_length(slot)
        assert after > before  # assistant prefix + generated tokens in the slot

        # other slots untouched
        engine.open_session("s2")
        assert engine.store.kv_length(engine.store.slot_of("s2")) > 0


class TestCapacityBoundary:
    """Device OOM surfaces as a structured CapacityError, never a raw
    XlaRuntimeError crash (VERDICT r4 #5). OOM is simulated by patching the
    device-touching member with one that raises RESOURCE_EXHAUSTED text —
    the same shape XLA produces — since a real OOM needs a full chip."""

    def _oom(self, *a, **k):
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory allocating 1234567890 bytes.")

    def test_open_session_oom_is_capacity_error(self):
        from freeze_omni_tpu.runtime.engine import CapacityError

        engine = ServingEngine(tiny_system(), seed=0)
        engine.core.role_kv = self._oom
        with pytest.raises(CapacityError) as ei:
            engine.open_session("s1", role="a role not yet cached")
        assert ei.value.active_sessions == 0
        # the engine stays usable: the default role is cached by _Core init?
        # no — prove recovery by restoring the real method
        engine.core.role_kv = type(engine.core).role_kv.__get__(engine.core)
        engine.open_session("s2")
        assert engine.num_active == 1

    def test_tick_oom_is_capacity_error(self):
        from freeze_omni_tpu.runtime.engine import CapacityError

        engine = ServingEngine(tiny_system(), seed=0)
        engine.open_session("s1")
        engine.submit_chunk("s1", "user", _chunks(9, 1)[0], is_sl=True)
        engine._recognize = self._oom
        with pytest.raises(CapacityError) as ei:
            engine.tick()
        assert ei.value.active_sessions == 1

    def test_non_oom_errors_pass_through(self):
        engine = ServingEngine(tiny_system(), seed=0)
        engine.open_session("s1")
        engine.submit_chunk("s1", "user", _chunks(9, 1)[0], is_sl=True)

        def bad(*a, **k):
            raise ValueError("unrelated bug")

        engine._recognize = bad
        with pytest.raises(ValueError):
            engine.tick()

    def test_mixed_chunk_shapes_rejected_loudly(self):
        """One tick = one padded batch per identity: a chunk whose [T,F]
        differs from already-pending chunks must be rejected at submit time
        (VERDICT r4 weak #6), not silently mis-indexed."""
        engine = ServingEngine(tiny_system(), seed=0)
        engine.open_session("s1")
        engine.open_session("s2")
        engine.submit_chunk("s1", "user", _chunks(9, 1, t=32)[0], is_sl=True)
        with pytest.raises(ValueError, match="mixed chunk shapes"):
            engine.submit_chunk("s2", "user", _chunks(9, 1, t=16)[0],
                                is_sl=True)
        # the uniform-shape tick still works
        engine.submit_chunk("s2", "user", _chunks(9, 1, t=32)[0], is_sl=True)
        out = engine.tick()
        assert len(out["user"]) == 2


class TestPipelinePool:
    def test_pool_api_parity(self):
        cfg = tiny_system()
        pool = PipelinePool(size=1, cfg=cfg)
        h1 = pool.acquire()
        h2 = pool.acquire()
        assert h1 is h2 and h1.user_count == 2
        pool.release(h1)
        assert h1.user_count == 1
        assert isinstance(h1.pipeline_proc, ServingEngine)


class TestDualIdentityTick:
    def test_fused_tick_matches_serial_ticks(self):
        """When user AND system chunks are pending the tick fuses both
        identities into one dispatch; results must match the serial
        two-dispatch path (same op order: user first)."""
        import jax

        from freeze_omni_tpu.config import tiny_system
        from freeze_omni_tpu.runtime.engine import ServingEngine

        cfg = tiny_system()
        rs = np.random.RandomState(3)
        u_chunk = rs.randn(1, 32, 80).astype(np.float32)
        s_chunk = rs.randn(1, 32, 80).astype(np.float32)

        def build():
            eng = ServingEngine(cfg, seed=0)
            eng.open_session("s0")
            return eng

        fused = build()
        fused.submit_chunk("s0", "user", u_chunk, is_sl=True)
        fused.submit_chunk("s0", "system", s_chunk, is_sl=True)
        out_f = fused.tick()

        serial = build()
        serial.submit_chunk("s0", "user", u_chunk, is_sl=True)
        out_s = serial.tick()
        serial.submit_chunk("s0", "system", s_chunk, is_sl=True)
        serial.tick()

        slot = fused.store.slot_of("s0")
        pf, ps = out_f["user"][slot], out_s["user"][slot]
        np.testing.assert_allclose(
            [pf["state_1"], pf["state_2"]], [ps["state_1"], ps["state_2"]],
            atol=1e-5)
        assert fused.store.kv_length(slot) == serial.store.kv_length(slot)
        np.testing.assert_allclose(
            np.asarray(fused.store.gather_kv(slot).k),
            np.asarray(serial.store.gather_kv(slot).k), atol=1e-5)
        # the host length mirror tracks the true device lengths
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(fused.store.caches.kv.length)),
            fused._len_host)

    def test_fused_tick_mixed_row_activity(self):
        """The single-LLM-pass dual step (audio_llm.recognize_step_dual) must
        gate per ROW: in one tick, session A has only a user chunk, B only a
        system chunk, C both, D nothing — each row must match the same
        traffic through serial single-identity ticks."""
        from freeze_omni_tpu.config import tiny_system
        from freeze_omni_tpu.runtime.engine import ServingEngine

        cfg = tiny_system()
        cfg = dataclasses.replace(
            cfg, serving=dataclasses.replace(cfg.serving, max_sessions=4))
        rs = np.random.RandomState(11)
        chunks = {k: rs.randn(1, 32, 80).astype(np.float32)
                  for k in ("au", "bs", "cu", "cs")}

        def build():
            eng = ServingEngine(cfg, seed=0)
            for sid in "abcd":
                eng.open_session(sid)
            return eng

        fused = build()
        fused.submit_chunk("a", "user", chunks["au"], is_sl=True)
        fused.submit_chunk("b", "system", chunks["bs"], is_sl=True)
        fused.submit_chunk("c", "user", chunks["cu"], is_sl=True)
        fused.submit_chunk("c", "system", chunks["cs"], is_sl=False)
        out_f = fused.tick()

        serial = build()
        serial.submit_chunk("a", "user", chunks["au"], is_sl=True)
        serial.submit_chunk("c", "user", chunks["cu"], is_sl=True)
        out_s = serial.tick()
        serial.submit_chunk("b", "system", chunks["bs"], is_sl=True)
        serial.submit_chunk("c", "system", chunks["cs"], is_sl=False)
        serial.tick()

        for sid in ("a", "c"):
            slot = fused.store.slot_of(sid)
            pf, ps = out_f["user"][slot], out_s["user"][slot]
            np.testing.assert_allclose(
                [pf["state_1"], pf["state_2"]],
                [ps["state_1"], ps["state_2"]], atol=1e-5)
        for sid in "abcd":
            slot = fused.store.slot_of(sid)
            length = fused.store.kv_length(slot)
            assert length == serial.store.kv_length(slot), sid
            # compare VALID slots only: slots >= length (incl. the S-1
            # scratch slot masked tokens park in, qwen2.forward:160-163)
            # hold garbage that legitimately differs between the paths
            np.testing.assert_allclose(
                np.asarray(fused.store.gather_kv(slot).k)[:, :, :length],
                np.asarray(serial.store.gather_kv(slot).k)[:, :, :length],
                atol=1e-5, err_msg=sid)


class TestSessionMigration:
    """export_session/import_session: move a live session between engines
    (failover / rebalancing), including across meshes and KV dtypes."""

    def _warm(self, engine, sid="m1", seeds=(11, 12)):
        engine.open_session(sid, role="Migration test.")
        for i, s in enumerate(seeds):
            engine.submit_chunk(sid, "user", _chunks(s, 1)[0], is_sl=(i == 0))
            engine.tick()

    def test_import_resumes_exactly(self):
        cfg = tiny_system()
        src = ServingEngine(cfg, seed=0)
        self._warm(src)
        blob = src.export_session("m1")
        assert blob["prefix_len"] > 0

        dst = ServingEngine(cfg, seed=0)  # same params (same seed)
        dst.import_session("m1", blob)
        s_slot, d_slot = src.store.slot_of("m1"), dst.store.slot_of("m1")
        assert src.store.kv_length(s_slot) == dst.store.kv_length(d_slot)

        nxt = _chunks(13, 1)[0]
        src.submit_chunk("m1", "user", nxt, is_sl=False)
        dst.submit_chunk("m1", "user", nxt, is_sl=False)
        a = src.tick()["user"][s_slot]
        b = dst.tick()["user"][d_slot]
        for k in ("state_1", "state_2"):
            assert abs(a[k] - b[k]) < 1e-6, (a, b)

    def test_cross_topology_migration(self):
        """Export from an unsharded engine, resume on a ('data','model') TP
        mesh — the cast/scatter lifts the row onto the sharded store."""
        from freeze_omni_tpu.parallel.mesh import make_mesh

        cfg = tiny_system()
        src = ServingEngine(cfg, seed=0)
        self._warm(src)
        blob = src.export_session("m1")

        mesh = make_mesh((1, 2), ("data", "model"))
        dst = ServingEngine(cfg, seed=0, mesh=mesh)
        dst.import_session("m1", blob)

        nxt = _chunks(14, 1)[0]
        src.submit_chunk("m1", "user", nxt, is_sl=False)
        dst.submit_chunk("m1", "user", nxt, is_sl=False)
        a = src.tick()["user"][src.store.slot_of("m1")]
        b = dst.tick()["user"][dst.store.slot_of("m1")]
        for k in ("state_1", "state_2"):
            assert abs(a[k] - b[k]) < 2e-3, (a, b)

    def test_import_casts_kv_dtype(self):
        cfg = tiny_system()
        src = ServingEngine(cfg, seed=0)
        self._warm(src)
        blob = src.export_session("m1")
        dst = ServingEngine(cfg, seed=0, kv_dtype=jnp.bfloat16)
        dst.import_session("m1", blob)
        row = dst.store.gather_slot(dst.store.slot_of("m1"))
        assert row.kv.k.dtype == jnp.bfloat16
        # still serves: one more tick produces a finite prediction
        dst.submit_chunk("m1", "user", _chunks(15, 1)[0], is_sl=False)
        p = dst.tick()["user"][dst.store.slot_of("m1")]["state_1"]
        assert np.isfinite(p) and 0.0 <= p <= 1.0

    def test_export_unknown_sid_raises(self):
        cfg = tiny_system()
        engine = ServingEngine(cfg, seed=0)
        with pytest.raises(KeyError):
            engine.export_session("nope")


class TestServingSnapshot:
    """save_sessions/restore_sessions: serving checkpoint/resume. A restarted
    engine keeps every dialog's KV context; a reconnecting client (same sid)
    resumes mid-conversation via open_session's reattach path."""

    def test_save_restore_roundtrip(self, tmp_path):
        cfg = tiny_system()
        src = ServingEngine(cfg, seed=0)
        for i, sid in enumerate(("a", "b")):
            src.open_session(sid, role=f"Snapshot test {i}.")
            src.submit_chunk(sid, "user", _chunks(20 + i, 1)[0], is_sl=True)
        src.tick()
        saved = src.save_sessions(str(tmp_path))
        assert set(saved) == {"a", "b"}

        dst = ServingEngine(cfg, seed=0)  # "restarted" process, same params
        restored = dst.restore_sessions(str(tmp_path))
        assert set(restored) == {"a", "b"}
        # reattach: open_session on a restored sid must keep the KV context
        dst.open_session("a")
        assert dst.store.kv_length(dst.store.slot_of("a")) == \
            src.store.kv_length(src.store.slot_of("a"))

        nxt = _chunks(25, 1)[0]
        for e in (src, dst):
            e.submit_chunk("a", "user", nxt, is_sl=False)
        pa = src.tick()["user"][src.store.slot_of("a")]
        pb = dst.tick()["user"][dst.store.slot_of("a")]
        for k in ("state_1", "state_2"):
            assert abs(pa[k] - pb[k]) < 1e-6, (pa, pb)

    def test_restore_rejects_unknown_version(self, tmp_path):
        import json
        (tmp_path / "sessions.json").write_text(json.dumps({"version": 99}))
        engine = ServingEngine(tiny_system(), seed=0)
        with pytest.raises(ValueError, match="version"):
            engine.restore_sessions(str(tmp_path))


class TestSnapshotHardening:
    def test_bf16_snapshot_roundtrip(self, tmp_path):
        """np.savez degrades ml_dtypes bfloat16 to raw void bytes; the saver
        must store such leaves as f32 or the restore raises 'No cast function
        available' — exactly the layout serve.py uses at full scale."""
        cfg = tiny_system()
        src = ServingEngine(cfg, seed=0, kv_dtype=jnp.bfloat16)
        src.open_session("a", role="bf16 snapshot.")
        src.submit_chunk("a", "user", _chunks(30, 1)[0], is_sl=True)
        src.tick()
        src.save_sessions(str(tmp_path))

        dst = ServingEngine(cfg, seed=0, kv_dtype=jnp.bfloat16)
        assert dst.restore_sessions(str(tmp_path)) == ["a"]
        row = dst.store.gather_slot(dst.store.slot_of("a"))
        assert row.kv.k.dtype == jnp.bfloat16
        dst.submit_chunk("a", "user", _chunks(31, 1)[0], is_sl=False)
        p = dst.tick()["user"][dst.store.slot_of("a")]["state_1"]
        assert np.isfinite(p) and 0.0 <= p <= 1.0

    def test_restore_overflow_skips_instead_of_bricking(self, tmp_path):
        cfg = tiny_system()
        big = dataclasses.replace(
            cfg, serving=dataclasses.replace(cfg.serving, max_sessions=3))
        src = ServingEngine(big, seed=0)
        for i in range(3):
            src.open_session(f"s{i}")
        src.save_sessions(str(tmp_path))

        small = dataclasses.replace(
            cfg, serving=dataclasses.replace(cfg.serving, max_sessions=2))
        dst = ServingEngine(small, seed=0)
        restored = dst.restore_sessions(str(tmp_path))
        assert len(restored) == 2  # what fits, no exception
        assert dst.num_active == 2

    def test_reattach_preserves_role(self):
        cfg = tiny_system()
        engine = ServingEngine(cfg, seed=0)
        engine.open_session("r1", role="Original role.")
        slot = engine.store.slot_of("r1")
        # reconnect with no role (the server path): the recorded role must
        # survive — the KV row still holds the original role prefill
        engine.open_session("r1")
        assert engine._slot_role[slot] == "Original role."
