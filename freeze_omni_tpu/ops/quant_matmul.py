"""Pallas int8 weight-dequant matmul.

Why this exists: with weight-only int8 (ops/quant.py), an XLA-level dequant
(`w_q.astype(bf16) * scale`) inside a decode loop gets hoisted as loop-
invariant and materializes the ENTIRE bf16 weight stack (~13 GB for 7B) —
reproducibly OOMing the chip even at 12 layers. This kernel keeps weights int8
all the way into VMEM: each grid cell DMAs an [BK, BN] int8 tile, dequantizes
in VMEM, and accumulates x @ w into a f32 tile. Opaque to XLA, so nothing can
be hoisted; HBM weight traffic is halved vs bf16, which is the dominant cost
of single-token decode.

Contract: y[N, O] = x[N, K] @ (w_q[K, O] * scale[O]); O and K must be
multiples of the block sizes (all Qwen2-7B projection dims are).

Status on the current axon-tunneled v5e: int8 weights inside while-loops hit
an opaque RESOURCE_EXHAUSTED above ~8 transformer layers regardless of actual
byte count (2.8 GB int8 fails where 5.6 GB bf16 succeeds; single-dispatch
forwards work at 24 layers; 6-layer loops work). Bisected to the loop+int8
combination itself — stacked vs per-layer buffers and XLA-dequant vs this
kernel all reproduce it, so it is a backend limitation, not graph structure.
int8 therefore ships opt-in; full-depth single-host serving uses bf16 with
tensor parallelism over ICI (parallel/mesh.py) as the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = w_ref[:].astype(jnp.float32) * s_ref[0][None, :]
    o_ref[:] += jax.lax.dot(x_ref[:].astype(jnp.float32), w,
                            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_k", "block_o", "interpret"))
def quant_matmul(x, w_q, scale, block_k: int = 1792, block_o: int = 512,
                 interpret: bool = False):
    """x: [N, K] float; w_q: [K, O] int8; scale: [O] f32 -> [N, O] in x.dtype."""
    N, K = x.shape
    O = w_q.shape[1]
    assert K % block_k == 0 and O % block_o == 0, (K, O, block_k, block_o)

    # pad rows to the f32 sublane tile
    n_pad = (-N) % 8
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    Np = x.shape[0]

    out = pl.pallas_call(
        _kernel,
        grid=(O // block_o, K // block_k),
        in_specs=[
            pl.BlockSpec((Np, block_k), lambda o, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_o), lambda o, k: (k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o), lambda o, k: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Np, block_o), lambda o, k: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, w_q, scale[None, :].astype(jnp.float32))
    return out[:N].astype(x.dtype)


def pick_blocks(K: int, O: int):
    """Largest VMEM-friendly blocks that divide the dims."""
    def pick(n, candidates):
        for c in candidates:
            if n % c == 0:
                return c
        return n

    return pick(K, (1792, 1024, 512, 896, 256, 128)), \
        pick(O, (512, 896, 448, 256, 128))
