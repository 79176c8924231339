"""Session store: batched per-user caches with slot allocation.

The reference externalizes every per-user cache so any replica can serve any
chunk ("Model as a Server", models/pipeline.py:36-44, bin/pool.py). The
TPU-native equivalent keeps ONE resident model and batches all sessions' caches
along a leading axis: a slot allocator maps session ids to rows of a single
`SessionCaches` pytree; per-slot reset re-initializes one row functionally.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioLLMConfig
from ..models import audio_llm, qwen2


def _set_row_impl(tree_new_row, tree_batched, slot, batch_axes):
    """Write one row of a batched pytree. batch_axes mirrors the tree with the
    batch-axis index per leaf (a hashable NamedTuple — static). `slot` is
    traced so every slot shares one compiled program.

    Two jitted variants below. The default is NOT donated: the engine is
    multithreaded (websocket opens, responder threads, the tick thread) and
    references to the current pool legitimately escape the lock as read-only
    snapshots (e.g. tick's post-step kv.length fetch). Donating here deleted
    a buffer another thread was fetching — observed as 'Array has been
    deleted' ticker crashes under an 8-client load test. The copy this costs
    is ~4.6 ms at HBM speed of light and only runs at session open/reset/
    import. The donated variant exists for pools so large that input+output
    copies cannot coexist in HBM (128 sessions x kv_len 1024 int8 = 4.1 GB
    pool next to 7.6 GB int8 weights on a 16 GB chip); SessionStore(donate=
    True) opts in, and the engine then guarantees every pool dispatch is
    enqueued under its lock so no stale reference outlives the donation."""
    return jax.tree.map(
        lambda row, full, ax: jax.lax.dynamic_update_index_in_dim(
            full, row.astype(full.dtype), slot, ax),
        tree_new_row, tree_batched, batch_axes)


_set_row = jax.jit(_set_row_impl, static_argnames=("batch_axes",))
_set_row_donated = jax.jit(_set_row_impl, static_argnames=("batch_axes",),
                           donate_argnums=(1,))


def _scatter_kv_rows_impl(full: qwen2.KVCache, new: qwen2.KVCache,
                          idx, r) -> qwen2.KVCache:
    """Write selected rows `r` of a batch-B KVCache `new` into pool slots
    `idx`. One compiled program instead of the former eager moveaxis/set
    chain (fewer tunneled dispatches). `idx` is padded by the caller to a
    fixed bucket length (duplicate writes carry identical data, so order is
    irrelevant). Donation follows the same policy as _set_row_impl: off by
    default (runs every tick while any session is speaking, and donating
    per-tick dispatches measured slower on the tunneled device — see
    engine.__init__), on for pools too large for two HBM copies."""
    kv_axes = qwen2.cache_axes(full)

    def put(n, f, ax):
        take = jnp.take(n, r, axis=ax)
        moved = jnp.moveaxis(f, ax, 0)
        moved = moved.at[idx].set(jnp.moveaxis(take, ax, 0).astype(f.dtype))
        return jnp.moveaxis(moved, 0, ax)

    return jax.tree.map(put, new, full, kv_axes)


_scatter_kv_rows = jax.jit(_scatter_kv_rows_impl)
_scatter_kv_rows_donated = jax.jit(_scatter_kv_rows_impl,
                                   donate_argnums=(0,))


def session_batch_axes(caches: audio_llm.SessionCaches):
    """Batch-axis index for each leaf of SessionCaches."""
    def enc_axes(st):
        return type(st)(k_cache=1, v_cache=1, valid=0, pe_index=0, ffn_cache=1)

    def adp_axes(st):
        return type(st)(c1=None if st.c1 is None else 0, c2=0)

    return audio_llm.SessionCaches(
        enc_user=enc_axes(caches.enc_user),
        adp_user=adp_axes(caches.adp_user),
        enc_system=enc_axes(caches.enc_system),
        adp_system=adp_axes(caches.adp_system),
        kv=qwen2.cache_axes(caches.kv),
    )


class SessionStore:
    def __init__(self, cfg: AudioLLMConfig, max_sessions: int,
                 kv_dtype=jnp.float32, kv_quant_bits: Optional[int] = None,
                 donate: bool = False):
        self.cfg = cfg
        self.max_sessions = max_sessions
        self.kv_quant_bits = kv_quant_bits
        self.donate = bool(donate)
        self.caches = audio_llm.init_session(cfg, max_sessions, kv_dtype,
                                             kv_quant_bits)
        self._axes = session_batch_axes(self.caches)
        # numpy (uncommitted): a committed single-device template would be
        # rejected when written into mesh-global caches under multi-host —
        # uncommitted host values lift to replicated on whatever mesh the
        # destination lives on
        self._row_template = jax.tree.map(
            np.asarray, audio_llm.init_session(cfg, 1, kv_dtype,
                                               kv_quant_bits))
        self._free: List[int] = list(range(max_sessions))
        self._slots: Dict[str, int] = {}
        # pinned role-prefill length per slot (the sliding-KV "sink" prefix)
        self.prefix_len = np.zeros((max_sessions,), np.int32)

    def alloc(self, sid: str, role_kv: Optional[qwen2.KVCache] = None,
              reset: bool = True) -> int:
        """Claim a slot; optionally seed its LLM KV row from a system-role
        prefill (a batch-1 KVCache). reset=False skips the on-device template
        write for callers that immediately scatter a full row (imports) —
        halves their device traffic."""
        if sid in self._slots:
            return self._slots[sid]
        if not self._free:
            raise RuntimeError("no free session slots")
        slot = self._free.pop(0)
        self._slots[sid] = slot
        if reset:
            self.reset_slot(slot, role_kv)
        else:
            self.prefix_len[slot] = 0
        return slot

    def free(self, sid: str) -> None:
        slot = self._slots.pop(sid, None)
        if slot is not None:
            self._free.append(slot)

    def slot_of(self, sid: str) -> int:
        return self._slots[sid]

    def has(self, sid: str) -> bool:
        return sid in self._slots

    @property
    def active_sids(self):
        return list(self._slots)

    def reset_slot(self, slot: int, role_kv: Optional[qwen2.KVCache] = None) -> None:
        row = self._row_template
        self.prefix_len[slot] = 0
        if role_kv is not None:
            # seed the KV row: copy the role prefill into position 0..len
            row = row._replace(kv=role_kv)
            self.prefix_len[slot] = int(np.asarray(role_kv.length)[0])
        # squeeze the batch-1 row to unbatched leaves for dynamic_update
        def squeeze(leaf, ax):
            return jnp.take(leaf, 0, axis=ax) if ax is not None else leaf

        row_sq = jax.tree.map(lambda l, a: squeeze(l, a), row, self._axes)
        set_row = _set_row_donated if self.donate else _set_row
        self.caches = set_row(row_sq, self.caches, jnp.asarray(slot),
                              self._axes)

    def shard(self, mesh) -> None:
        """Place the whole cache tree on a ('data','model') mesh: session rows
        shard over 'data' on every leaf's batch axis, LLM KV additionally
        shards kv-heads over 'model' (parallel/mesh.kv_cache_specs); kv.length
        stays replicated (host mirrors and roll checks read it whole). Works
        for single-host multi-chip meshes and global multi-host meshes alike —
        all later row updates are eager SPMD ops on the global tree."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import kv_cache_specs

        specs = jax.tree.map(
            lambda leaf, ax: P(*(None,) * ax, "data"), self.caches, self._axes)
        has_scales = self.caches.kv.k_scale is not None
        # scales [L, B, S, Hkv]: same layout as k/v minus the head_dim axis
        scale_spec = P(None, "data", None, "model") if has_scales else None
        specs = specs._replace(kv=qwen2.KVCache(
            k=kv_cache_specs(), v=kv_cache_specs(), length=P(),
            k_scale=scale_spec, v_scale=scale_spec))
        self.caches = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            self.caches, specs)

    @property
    def row_template_canonical(self) -> audio_llm.SessionCaches:
        """Row template with the KV in CANONICAL float layout (no quant
        scales). Session export/snapshot blobs always carry canonical-float
        KV so a session can migrate between engines with different
        kv_quant settings; import re-quantizes to this store's layout."""
        if self.kv_quant_bits is None:
            return self._row_template
        dt = self._row_template.enc_user.k_cache.dtype
        kv = jax.tree.map(np.asarray,
                          qwen2.init_cache(self.cfg.llm, 1, dtype=dt))
        return self._row_template._replace(kv=kv)

    def kv_length(self, slot: int) -> int:
        return int(np.asarray(self.caches.kv.length)[slot])

    @property
    def kv_capacity(self) -> int:
        """Max KV slots per session (the S of the batched [L, B, S, ...]
        cache; leaf-agnostic so a quantized cache reports the same S)."""
        return int(jax.tree.leaves(self.caches.kv.k)[0].shape[2])

    def gather_slot(self, slot: int) -> audio_llm.SessionCaches:
        """Extract one session's caches as a batch-1 pytree (for per-session
        work like response generation)."""
        def take(leaf, ax):
            sl = jnp.take(leaf, jnp.asarray([slot]), axis=ax) \
                if ax is not None else leaf
            return sl

        return jax.tree.map(take, self.caches, self._axes)

    def scatter_slot(self, slot: int, row: audio_llm.SessionCaches) -> None:
        """Write a batch-1 caches pytree back into the slot."""
        def squeeze(leaf, ax):
            return jnp.take(leaf, 0, axis=ax) if ax is not None else leaf

        row_sq = jax.tree.map(squeeze, row, self._axes)
        set_row = _set_row_donated if self.donate else _set_row
        self.caches = set_row(row_sq, self.caches, jnp.asarray(slot),
                              self._axes)

    def gather_kv(self, slot: int) -> qwen2.KVCache:
        return self.gather_slot(slot).kv

    def scatter_kv(self, slot: int, kv: qwen2.KVCache) -> None:
        row = self.gather_slot(slot)._replace(kv=kv)
        self.scatter_slot(slot, row)

    def gather_kv_many(self, slots: List[int]) -> qwen2.KVCache:
        """Extract several sessions' LLM KV rows as one batch-B KVCache (for
        batched response generation across concurrently-speaking sessions)."""
        idx = jnp.asarray(slots)
        kv = self.caches.kv
        kv_axes = qwen2.cache_axes(kv)
        return jax.tree.map(lambda leaf, ax: jnp.take(leaf, idx, axis=ax),
                            kv, kv_axes)

    def scatter_kv_many(self, slots: List[int], kv: qwen2.KVCache,
                        rows: Optional[List[int]] = None) -> None:
        """Write batch-B KV rows back into their slots. `kv` may carry MORE
        rows than `slots` (bucket padding); by default row i lands in
        slots[i]. `rows` selects which kv rows land (parallel to `slots`) —
        callers drop rows whose session closed mid-flight."""
        if not slots:
            return
        r_list = list(rows if rows is not None else range(len(slots)))
        # pad idx/r to the kv bucket size so every scatter of a given bucket
        # shares one compiled program (duplicate writes carry identical data)
        B = int(kv.k.shape[1])
        pad = B - len(slots)
        idx = jnp.asarray(list(slots) + [slots[0]] * pad)
        r = jnp.asarray(r_list + [r_list[0]] * pad)
        scatter = _scatter_kv_rows_donated if self.donate \
            else _scatter_kv_rows
        new_kv = scatter(self.caches.kv, kv, idx, r)
        self.caches = self.caches._replace(kv=new_kv)
