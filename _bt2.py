import jax, jax.numpy as jnp, numpy as np, time
from freeze_omni_tpu.ops.attention import decode_attention_blocked, decode_attention_reference
rng = np.random.RandomState(0)
B, H, Hkv, dk, S = 4, 28, 4, 128, 4096
q = jnp.asarray(rng.randn(B, H, dk), jnp.bfloat16)
k = jnp.asarray(rng.randn(B, S, Hkv, dk), jnp.bfloat16)
v = jnp.asarray(rng.randn(B, S, Hkv, dk), jnp.bfloat16)
short = jnp.asarray([300]*B, jnp.int32)
long_ = jnp.asarray([4096]*B, jnp.int32)

@jax.jit
def err_fn(q, k, v, length):
    ref = decode_attention_reference(q, k, v, length)
    out = decode_attention_blocked(q, k, v, length, block=512)
    return jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))

e = jax.block_until_ready(err_fn(q, k, v, short))
print("max err:", np.asarray(e), flush=True)

N = 30
def mkloop(fn, length):
    @jax.jit
    def loop(q):
        def body(i, acc):
            q2 = q * (1 + acc.mean().astype(q.dtype) * 1e-12)
            return acc + fn(q2, k, v, length).astype(jnp.float32)
        return jax.lax.fori_loop(0, N, body, jnp.zeros((B,H,dk), jnp.float32))
    return loop
for fn, length, name in [
    (lambda q,k,v,l: decode_attention_blocked(q,k,v,l,block=512), short, "blocked 300/4096"),
    (lambda q,k,v,l: decode_attention_blocked(q,k,v,l,block=512), long_, "blocked 4096/4096"),
    (decode_attention_reference, short, "xla-full 300/4096")]:
    loop = mkloop(fn, length)
    o = jax.block_until_ready(loop(q))
    t0 = time.perf_counter(); o = jax.block_until_ready(loop(q))
    print(f"{name}: {(time.perf_counter()-t0)/N*1e6:.1f} us/iter", flush=True)
