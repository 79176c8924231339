"""Real-chip probe for the int8-KV prefill attention kernel.

Compares, at Qwen2-7B serving shapes, per-dispatch time of:
  - bf16 cache + XLA einsum attention (the r3 baseline),
  - int8 cache + XLA dequant-then-einsum (the naive path the kernel exists
    to beat: it materializes a bf16 copy of the cache every layer),
  - int8 cache + Pallas in-VMEM dequant kernel,
and checks Pallas-vs-reference parity on-chip.

Run on the TPU:  python scripts/probe_kv_quant.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from freeze_omni_tpu.ops import attention as att_ops


CHAIN = 10  # ops fused per dispatch: the ~25 ms tunnel round trip otherwise
            # swamps the sub-ms device compute


def bench(fn, *args, iters=7):
    """Median per-op device time: CHAIN data-dependent calls in ONE jitted
    dispatch (the op's q input is perturbed by the previous output so XLA
    cannot CSE them), minus nothing — dispatch amortizes to noise."""

    @jax.jit
    def chained(*a):
        q0 = a[0]

        def body(_, q):
            out = fn(q, *a[1:])
            return (q0 + 1e-6 * out.astype(q0.dtype)).astype(q0.dtype)

        return jax.lax.fori_loop(0, CHAIN, body, q0)

    jax.block_until_ready(chained(*args))
    ts = []
    for _ in range(iters):
        t = time.perf_counter()
        jax.block_until_ready(chained(*args))
        ts.append(time.perf_counter() - t)
    return float(np.median(ts) * 1e3 / CHAIN)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)
    B, T, H, Hkv, dk, S = 8, 40, 28, 4, 128, 1024

    q = jnp.asarray(rng.randn(B, T, H, dk).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, Hkv, dk).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, Hkv, dk).astype(np.float32), jnp.bfloat16)
    k_q = jnp.asarray(rng.randint(-127, 128, (B, S, Hkv, dk)), jnp.int8)
    v_q = jnp.asarray(rng.randint(-127, 128, (B, S, Hkv, dk)), jnp.int8)
    k_s = jnp.asarray(0.01 + rng.rand(B, S, Hkv).astype(np.float32) * 0.05)
    v_s = jnp.asarray(0.01 + rng.rand(B, S, Hkv).astype(np.float32) * 0.05)
    qend = jnp.asarray(
        np.minimum(rng.randint(S // 2, S, (B, 1)) +
                   np.arange(T)[None, :], S), jnp.int32)

    # parity on-chip
    ref = att_ops.prefill_quant_reference(q, k_q, k_s, v_q, v_s, qend)
    out = att_ops.prefill_quant_pallas(q, k_q, k_s, v_q, v_s, qend)
    err = np.max(np.abs(np.asarray(out, np.float32) -
                        np.asarray(ref, np.float32)))
    cos = float(np.sum(np.asarray(out, np.float64) * np.asarray(ref, np.float64))
                / (np.linalg.norm(np.asarray(out, np.float64)) *
                   np.linalg.norm(np.asarray(ref, np.float64)) + 1e-12))
    print(f"pallas-vs-reference on-chip: max_abs_err={err:.4f} cosine={cos:.6f}")

    # timing — single-op dispatch (dispatch overhead dominates; still A/B-fair)
    mask = jnp.arange(S)[None, None, :] < qend[:, :, None]

    @jax.jit
    def xla_bf16(q, k, v):
        rep = H // Hkv
        qg = q.reshape(B, T, Hkv, rep, dk)
        s = jnp.einsum("bthrd,bshd->bhrts", qg, k) / np.sqrt(dk)
        s = jnp.where(mask[:, None, None], s, -1e9)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhrts,bshd->bthrd", p, v)

    ref_jit = jax.jit(att_ops.prefill_quant_reference)
    pal_jit = jax.jit(att_ops.prefill_quant_pallas)

    t_bf16 = bench(xla_bf16, q, k, v)
    t_xla_q = bench(ref_jit, q, k_q, k_s, v_q, v_s, qend)
    t_pal = bench(pal_jit, q, k_q, k_s, v_q, v_s, qend)
    print(f"B={B} T={T} S={S}: bf16-xla {t_bf16:.3f} ms | "
          f"int8-xla(dequant) {t_xla_q:.3f} ms | int8-pallas {t_pal:.3f} ms")

    # larger serving batch
    for B2 in (128,):
        idx = rng.randint(0, B, B2)
        args2 = [jnp.repeat(a, B2 // B, axis=0) if a.shape[0] == B else a
                 for a in (q, k_q, k_s, v_q, v_s, qend)]
        q2, kq2, ks2, vq2, vs2, qe2 = args2
        k2 = jnp.repeat(k, B2 // B, axis=0)
        v2 = jnp.repeat(v, B2 // B, axis=0)
        mask2 = jnp.arange(S)[None, None, :] < qe2[:, :, None]

        @jax.jit
        def xla_bf16_2(q, k, v):
            rep = H // Hkv
            Bl = q.shape[0]
            qg = q.reshape(Bl, T, Hkv, rep, dk)
            s = jnp.einsum("bthrd,bshd->bhrts", qg, k) / np.sqrt(dk)
            s = jnp.where(mask2[:, None, None], s, -1e9)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            return jnp.einsum("bhrts,bshd->bthrd", p, v)

        t1 = bench(xla_bf16_2, q2, k2, v2)
        t2 = bench(ref_jit, q2, kq2, ks2, vq2, vs2, qe2)
        t3 = bench(pal_jit, q2, kq2, ks2, vq2, vs2, qe2)
        print(f"B={B2} T={T} S={S}: bf16-xla {t1:.3f} ms | "
              f"int8-xla(dequant) {t2:.3f} ms | int8-pallas {t3:.3f} ms")


if __name__ == "__main__":
    main()
