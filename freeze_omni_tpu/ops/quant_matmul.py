"""Pallas int8 weight-dequant matmul (A/B alternative to the XLA dequant).

Each grid cell DMAs an [BK, BN] int8 tile into VMEM, dequantizes there, and
accumulates x @ w into an f32 tile — weights stay int8 all the way to VMEM,
so HBM weight traffic is halved vs bf16.

Contract: y[N, O] = x[N, K] @ (w_q[K, O] * scale[O]); O and K must be
multiples of the block sizes (all Qwen2-7B projection dims are).

Measured (v5e, 28-layer 7B decode scan): this kernel 16.6 ms/token vs XLA
dequant 10.8 ms/token — XLA's fused dequant+matmul wins for these shapes, so
`models/layers.QUANT_USE_PALLAS` defaults to False and this kernel remains
for A/B and as the template for fused-quantized variants.

History note: round 1 blamed a 'loop+int8 backend fault' for full-depth int8
OOMs; that was a misdiagnosed param-init peak (per-layer trees + jnp.stack
held both copies resident). Stacked int8 under a layer scan works fine.
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
