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


def _pick(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return n


def pick_blocks(K: int, O: int):
    """Largest VMEM-friendly blocks that divide the dims."""
    return _pick(K, (1792, 1024, 512, 896, 256, 128)), \
        _pick(O, (512, 896, 448, 256, 128))


def pick_block_o(O: int) -> int:
    return _pick(O, (512, 896, 448, 256, 128))


# ---------------------------------------------------------------------------
# int4 (grouped) dequant matmul
# ---------------------------------------------------------------------------
#
# XLA does NOT fuse the nibble unpack of packed int4 into the matmul operand
# read (measured 173 ms/token for the 28-layer 7B decode scan vs int8's
# 10.8 ms — the dequantized weights materialize). This kernel keeps weights
# packed all the way into VMEM and dequantizes there.
#
# MEASURED (v5e, full 28-layer 7B decode): this kernel 22.7 ms/token B=1
# (44 tok/s) vs the int8 XLA path's 10.75 ms (93 tok/s) — per-pallas_call
# overhead inside the layer scan (~0.1 ms x 196 matmuls/token) swamps the
# halved weight traffic at decode shapes, the same conclusion as the int8
# kernel A/B above. int4 therefore remains an OPT-IN memory-footprint lever
# (3.6 GiB vs 7.1 GiB resident for the backbone — room for longer KV or a
# second model on one chip), not the production decode path: int8 + XLA
# dequant stays the default.
#
# XLA-native int4 was ALSO measured and closed (round 3): (a) S4 arrays
# cannot cross a jit boundary on this jax/axon stack at all — argument
# relayout of S4 recurses in _array_shard_arg (RecursionError), eager ops
# included; (b) the boundary-safe variant (uint8 packed along the OUTPUT
# dim + in-jit lax.bitcast_convert_type -> int4 -> free reshape, no
# transpose) compiles and is numerically right, but XLA materializes the
# unpack instead of fusing it into the dot operand read: 32.6 ms for a
# 28-layer [1,3584]x[3584,18944] ffn scan vs int8's 4.7 ms (probe,
# dispatch-amortized). int8's dequant fuses; int4's does not, by 7x.
#
# W8A8 (dynamic activation quant, int8 x int8 -> int32 MXU) was measured and
# closed for PREFILL too (round 3): at the 128-stream recognize-prefill shape
# ([512, 3584] x [3584, 18944], 64-step carried scan, scalar readback),
# bf16 dense ran 118.9 TFLOP/s, weight-only int8->bf16 123.1, and W8A8 with
# per-tensor dynamic amax 100.6 — the round/clip/rescale around each matmul
# costs more than int8 MXU throughput returns at these shapes, and weight-only
# already matches dense bf16 while halving weight HBM traffic. Weight-only
# int8 therefore stays the production path for BOTH decode and prefill; no
# W8A8 mode is exposed.
#
# Packing (ops/quant.quantize_linear_int4): packed[i, o] holds unpacked rows
# 2i (low nibble) and 2i+1 (high nibble). Instead of interleaving rows
# in-kernel (an awkward sublane relayout), the CALLER splits the activation
# columns once: y = x[:, 0::2] @ lo + x[:, 1::2] @ hi — two clean dots per
# tile against the nibble planes.


def _kernel4(xe_ref, xo_ref, w_ref, s_ref, o_ref, *, g_per_block: int,
             rows_per_group: int, block_o: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    s = s_ref[:]                       # [g_per_block, BO] — this step's groups
    rows = jnp.broadcast_to(
        s[:, None, :], (g_per_block, rows_per_group, block_o)
    ).reshape(g_per_block * rows_per_group, block_o)  # [BKP, BO]
    # Mosaic supports neither uint8 casts nor int8 vector arithmetic: the
    # packed bytes arrive bitcast to int8, widen to int32, recover the
    # unsigned byte, and do the nibble math in int32
    w4 = w_ref[:].astype(jnp.int32) & 0xFF   # [BKP, BO] 0..255
    lo = ((w4 & 0xF) - 8).astype(jnp.float32) * rows
    hi = (((w4 >> 4) & 0xF) - 8).astype(jnp.float32) * rows
    o_ref[:] += (
        jax.lax.dot(xe_ref[:].astype(jnp.float32), lo,
                    preferred_element_type=jnp.float32)
        + jax.lax.dot(xo_ref[:].astype(jnp.float32), hi,
                      preferred_element_type=jnp.float32))


@functools.partial(jax.jit, static_argnames=("group", "block_kp", "block_o",
                                             "interpret"))
def quant_matmul4(x, w_q4, scale4, group: int = 64, block_kp: int = 256,
                  block_o: int = 512, interpret: bool = False):
    """x: [N, K] float; w_q4: [K/2, O] packed uint8; scale4: [K/group, O]
    f32 -> [N, O] in x.dtype.

    Mosaic tiling constraints shape the defaults: xe/xo/w blocks need a
    lane/sublane dim that is a multiple of (8, 128), and the scale block's
    sublane dim (groups per k-step) must be a multiple of 8 — group=64 with
    block_kp=256 packed rows gives exactly 8 scale groups per step."""
    N, K = x.shape
    Kp, O = w_q4.shape
    assert K == 2 * Kp and K % group == 0 and O % block_o == 0, \
        (K, Kp, O, group, block_o)
    block_kp = min(block_kp, Kp)
    assert Kp % block_kp == 0 and block_kp % (group // 2) == 0, \
        (Kp, block_kp, group)
    g_per_block = (2 * block_kp) // group

    xe = x[:, 0::2]                    # [N, Kp] — even unpacked rows
    xo = x[:, 1::2]
    n_pad = (-N) % 8
    if n_pad:
        xe = jnp.pad(xe, ((0, n_pad), (0, 0)))
        xo = jnp.pad(xo, ((0, n_pad), (0, 0)))
    Np = xe.shape[0]

    kern = functools.partial(_kernel4, g_per_block=g_per_block,
                             rows_per_group=group // 2, block_o=block_o)
    out = pl.pallas_call(
        kern,
        grid=(O // block_o, Kp // block_kp),
        in_specs=[
            pl.BlockSpec((Np, block_kp), lambda o, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, block_kp), lambda o, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kp, block_o), lambda o, k: (k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_per_block, block_o), lambda o, k: (k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Np, block_o), lambda o, k: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xe, xo, jax.lax.bitcast_convert_type(w_q4, jnp.int8),
      scale4.astype(jnp.float32))
    return out[:N].astype(x.dtype)


