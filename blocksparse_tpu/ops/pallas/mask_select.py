"""Mask-select gather/scatter: scattered-index data movement on MXU/VPU.

The reference's scattered-index hot loop is a BLAS gemv on ``view``s of
arbitrary gather lists (/root/reference/src/blockmatrix.jl:236-242); its
TPU translation needs real gather/scatter, and XLA's element-granularity
gather/scatter runs at ~7 ns/index (random scalar access uses 1 of 128
lanes).  These kernels express the same data movement as dense mask
algebra, which is what the hardware is actually good at.

Elements live on the LANE axis end to end (Mosaic cannot move lanes to
sublanes, so nothing is ever flattened across the tile):

    gather   out[e] = x[idx[e]], per grid step of E lane-elements:
        CH^T = (chunk_iota_sub == idx[e] >> 7)   one-hot      [NC, E]
        P    = x^T @ CH^T                        MXU          [128, E]
                 (P[:, e] = x chunk row of element e, as a column)
        out  = sum_sub(P * (lane_iota_sub == idx & 127))      [1, E]

    scatter  y[idx[e]] += v[e]:
        VE   = v * (lane_iota_sub == idx & 127)  lane-expand  [128, E]
        y2^T += VE @ CH^T (contracting E)        MXU          [128, NC]

x^T / y2^T live VMEM-resident as [128, NC] lane-chunk grids for the whole
kernel (transposed to/from the natural layout by two tiny XLA ops); the
only HBM traffic is the index tables (4 B/index) and the values.  All
selection contractions run at HIGHEST precision with exact 0/1 one-hots,
so results are exact f32 (same argument as the slab kernel's one-hot
operators, ops/pallas/slab_spmv.py).

Sentinel convention: any index >= NC*128 has chunk id >= NC, so its CH^T
column is all-zero -> gathers 0, scatters nowhere -- no special casing.

Cost: 128*NC MAC/index on the MXU; NC <= 256 (n <= 32768) keeps the
working set VMEM-resident; larger n falls back to the XLA engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mask_gather", "mask_scatter_add", "eligible"]

# (Precision.HIGH -- 3-pass bf16x3, still exact with 0/1 one-hots -- would
# halve the MXU passes, but Mosaic only lowers HIGHEST/DEFAULT in-kernel.)
HI = jax.lax.Precision.HIGHEST
LANES = 128
E = 4096           # lane-elements per grid step
MAX_NC = 256       # x/y VMEM-residency cap: n <= 32768

_NT = (((1,), (1,)), ((), ()))  # contract lhs dim1 with rhs dim1 (NT gemm)


def eligible(n: int, dtype) -> bool:
    """Static check: operand length within the VMEM-resident chunk grid."""
    return (
        jnp.dtype(dtype) == jnp.float32
        and -(-int(n) // LANES) <= MAX_NC
    )


def _iota_sub(rows):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)


def _gather_kernel(idx_ref, xt_ref, out_ref):
    NC = xt_ref.shape[1]
    idx = idx_ref[0]                                       # [1, E] int32
    cht = (_iota_sub(NC) == idx // LANES).astype(jnp.float32)   # [NC, E]
    p = jax.lax.dot_general(
        xt_ref[:], cht, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI,
    )                                                      # [128, E]
    lmt = (_iota_sub(LANES) == idx % LANES).astype(jnp.float32)  # [128, E]
    out_ref[0] = jnp.sum(p * lmt, axis=0, keepdims=True)


def _scatter_kernel(idx_ref, v_ref, y2t_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y2t_ref[:] = jnp.zeros_like(y2t_ref)

    NC = y2t_ref.shape[1]
    idx = idx_ref[0]                                       # [1, E]
    cht = (_iota_sub(NC) == idx // LANES).astype(jnp.float32)   # [NC, E]
    lmt = (_iota_sub(LANES) == idx % LANES).astype(jnp.float32)  # [128, E]
    ve = lmt * v_ref[0]                                    # [128, E]
    y2t_ref[:] += jax.lax.dot_general(
        ve, cht, _NT, preferred_element_type=jnp.float32, precision=HI,
    )                                                      # [128, NC]


@functools.partial(jax.jit, static_argnames=("interpret",))
def mask_gather(x, idx, *, interpret: bool = False):
    """out[...] = x[idx[...]] for f32 x ([n]) and int32 idx (any shape).

    Indices >= n read 0 (the element engine's sentinel convention)."""
    n = x.shape[0]
    NC = -(-n // LANES)
    xpad = NC * LANES - n
    x2 = (jnp.pad(x, (0, xpad)) if xpad else x).reshape(NC, LANES)
    xt = x2.T                                              # [128, NC]
    K = idx.size
    T = -(-K // E)
    flat = idx.reshape(-1).astype(jnp.int32)
    flat = jnp.minimum(flat, NC * LANES)  # real sentinels -> zero column
    flat = jnp.pad(flat, (0, T * E - K), constant_values=NC * LANES)
    tiles = flat.reshape(T, 1, E)
    out = pl.pallas_call(
        _gather_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, E), lambda s: (s, 0, 0)),
            pl.BlockSpec((LANES, NC), lambda s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, E), lambda s: (s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 1, E), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * E * NC * LANES,
            bytes_accessed=T * E * 8 + NC * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tiles, xt)
    return out.reshape(-1)[:K].reshape(idx.shape)


@functools.partial(jax.jit, static_argnames=("out_len", "interpret"))
def mask_scatter_add(v, idx, out_len: int, *, interpret: bool = False):
    """y = zeros(out_len); y[idx[...]] += v[...]; returns y (f32).

    Duplicate indices accumulate deterministically (dense matmul
    reduction).  Indices >= out_len are dropped."""
    NC = -(-int(out_len) // LANES)
    K = idx.size
    T = -(-K // E)
    flat = idx.reshape(-1).astype(jnp.int32)
    vflat = v.reshape(-1).astype(jnp.float32)
    flat = jnp.where(flat >= out_len, NC * LANES, flat)
    flat = jnp.pad(flat, (0, T * E - K), constant_values=NC * LANES)
    vflat = jnp.pad(vflat, (0, T * E - K))
    tiles = flat.reshape(T, 1, E)
    vtiles = vflat.reshape(T, 1, E)
    y2t = pl.pallas_call(
        _scatter_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, E), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, 1, E), lambda s: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((LANES, NC), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((LANES, NC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * E * NC * LANES,
            bytes_accessed=T * E * 8 + NC * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tiles, vtiles)
    return y2t.T.reshape(-1)[:out_len]
