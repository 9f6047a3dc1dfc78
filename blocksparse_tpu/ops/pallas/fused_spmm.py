"""Fused Pallas TPU kernel: chunk-granular block SpMV / SpMM.

This is the framework's native compute engine -- the role BLAS ``gemv``/
``gemm`` plays in the reference's hot loop (blockmatrix.jl:236-242,
vbcrs.jl:278-284), redesigned for the TPU memory hierarchy:

  - block values stream HBM -> VMEM through the automatic Pallas pipeline
    (double-buffered DMA), batched ``block_batch`` blocks per grid step so
    per-step overhead amortizes at SpMV bandwidth;
  - x lives in VMEM; gather and scatter run at **chunk granularity**: SMEM
    index tables (scalar prefetch) hold each block's C-aligned chunk
    positions, and the kernel issues one dynamic slice per chunk.  This
    serves contiguous ranges (one chunk after another), k-merged slots
    (concatenations of ranges -- core/layout.py _kmerge), and arbitrary
    chunk-scattered blocks with the same code;
  - each (block, in-chunk) pair issues one MXU contraction
    ``[mp, C] @ [C, TR]`` accumulated over in-chunks;
  - results accumulate into a VMEM-resident y panel (revisited output:
    constant index_map keeps it on-chip for the whole grid), read-modify-
    written per out-chunk -- race-free because the block grid dimension is
    sequential ("arbitrary" semantics) on TPU;
  - multi-RHS is tiled over ``r_tile`` columns in the outer grid dimension
    (the reference has no SpMM kernel at all -- LinearMaps falls back to
    column-wise products; this is where the MXU pays off).

Transposed products swap the roles of the row/col chunk tables and contract
over the block's row axis instead -- a flag flip, no data movement (and it
parallelizes the transpose path the reference left serial, vbcrs.jl:303-329).
``symmetric=True`` adds each block's mirrored (transposed) contribution in
the same pass -- one HBM read per stored block feeding two MXU contractions,
where the reference reads every off-diagonal block twice
(symmetricblockmatrix.jl:394-418).

Constraints of this kernel (callers fall back to the XLA path otherwise,
see ops/xla_spmv.py): chunked buckets (chunk > 1), real dtypes, and x/y
panels that fit VMEM (~<= 6 MB each).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chunked_block_apply", "choose_config"]


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def _dot3(a, b, dims, acc_dtype):
    """Split-bf16 3-pass dot: emulates Precision.HIGH inside the kernel.

    Mosaic lowers only DEFAULT/HIGHEST in-kernel; HIGHEST costs 6 bf16
    passes per f32 dot.  The bf16x3 decomposition (a = ah + al exactly in
    the bf16 hi/lo split) reproduces XLA's HIGH (~1e-6 relative, the
    documented on-TPU tolerance) at half the MXU passes:
        a @ b ~= ah@bh + ah@bl + al@bh       (al@bl ~ 2^-32, dropped)
    """
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(a.dtype)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(b.dtype)).astype(jnp.bfloat16)

    def d(u, v):
        return jax.lax.dot_general(
            u, v, dims, preferred_element_type=acc_dtype, precision=None
        )

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _kernel(
    # scalar prefetch
    out_chunk_ref,  # [nb, sc] int32: y scatter chunk indices
    in_chunk_ref,  # [nb, gc] int32: x gather chunk indices
    # inputs
    x_ref,  # [Npad, TR] VMEM
    vals_ref,  # [BB, mp, kp] VMEM (one batch of blocks)
    # outputs
    out_ref,  # [Mpad, TR] VMEM, revisited across the whole grid
    *,
    nb: int,
    block_batch: int,
    mp: int,
    kp: int,
    chunk: int,
    transpose: bool,
    symmetric: bool,
    acc_dtype,
    precision,
    split3: bool = False,
):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    C = chunk
    mpc, kpc = mp // C, kp // C

    def dot(a, b, dims):
        if split3:
            return _dot3(a, b, dims, acc_dtype)
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=acc_dtype, precision=precision
        )

    def x_chunk(table_ref, b, j):
        start = pl.multiple_of(table_ref[b, j] * C, C)
        return x_ref[pl.ds(start, C), :]  # [C, TR]

    def out_rmw(table_ref, b, j, part):
        start = pl.multiple_of(table_ref[b, j] * C, C)
        out_ref[pl.ds(start, C), :] += part

    def body(i, _):
        b = step * block_batch + i

        @pl.when(b < nb)
        def _():
            blk = vals_ref[i]  # [mp, kp]
            if not transpose:
                # y[rows] += B @ x[cols] : accumulate over col chunks
                y = jnp.zeros((mp, x_ref.shape[1]), acc_dtype)
                for j in range(kpc):
                    y += dot(
                        blk[:, j * C : (j + 1) * C],
                        x_chunk(in_chunk_ref, b, j),
                        (((1,), (0,)), ((), ())),
                    )
                for j in range(mpc):
                    out_rmw(out_chunk_ref, b, j, y[j * C : (j + 1) * C, :])
            else:
                # y[cols] += B^T @ x[rows] : contract over the row axis
                y = jnp.zeros((kp, x_ref.shape[1]), acc_dtype)
                for j in range(mpc):
                    y += dot(
                        blk[j * C : (j + 1) * C, :],
                        x_chunk(in_chunk_ref, b, j),
                        (((0,), (0,)), ((), ())),
                    )
                for j in range(kpc):
                    out_rmw(out_chunk_ref, b, j, y[j * C : (j + 1) * C, :])

            if symmetric:
                # Fused mirrored contribution from the same block read:
                # y[cols] += B^T @ x[rows].  Grid steps are sequential, so
                # the second scatter is race-free by construction.
                yt = jnp.zeros((kp, x_ref.shape[1]), acc_dtype)
                for j in range(mpc):
                    yt += dot(
                        blk[j * C : (j + 1) * C, :],
                        x_chunk(out_chunk_ref, b, j),
                        (((0,), (0,)), ((), ())),
                    )
                for j in range(kpc):
                    out_rmw(in_chunk_ref, b, j, yt[j * C : (j + 1) * C, :])

        return 0

    jax.lax.fori_loop(0, block_batch, body, 0, unroll=True)


def _vmem_bytes(n_in: int, n_out: int, r_tile: int, mp: int, kp: int,
                block_batch: int, multi_rtile: bool,
                itemsize: int = 4) -> int:
    lanes = max(r_tile, 128)  # arrays are lane-padded to 128
    x_bytes = (n_in + max(mp, kp)) * lanes * itemsize * 2  # double buffered
    # Mosaic double-buffers the revisited output block too when the RHS-tile
    # grid has more than one step (its index_map then depends on j)
    y_bytes = (n_out + max(mp, kp)) * lanes * itemsize * (2 if multi_rtile else 1)
    v_bytes = 2 * block_batch * mp * _round_up(kp, 128) * itemsize
    return x_bytes + y_bytes + v_bytes


VMEM_BUDGET = 15_500_000  # scoped-vmem limit is 16 MB; leave scratch headroom


def choose_config(n_in: int, n_out: int, mp: int, kp: int, r: int,
                  nblocks: int):
    """Pick (r_tile, block_batch) fitting the VMEM budget, or None.

    Shared by the dispatch eligibility check and the kernel wrapper so they
    can never disagree (a silent eligibility/launch mismatch would fall a
    bucket back to XLA in one place but not the other).
    """
    if r > 1:
        r_tile = min(-(-r // 128) * 128, 512)
    else:
        r_tile = 1
    while True:
        multi = (-(-r // r_tile)) > 1
        # ~1 MB of block values per grid step (bb=16 at 128x128 f32 measured
        # 31.8 vs 29.7 TFLOP/s at 512 KB)
        bb = max(1, min(nblocks, (1024 * 1024) // max(1, mp * kp * 4)))
        while bb >= 1:
            if _vmem_bytes(n_in, n_out, r_tile, mp, kp, bb, multi) <= VMEM_BUDGET:
                return r_tile, bb
            bb //= 2
        if r_tile > 128:
            r_tile //= 2
        else:
            return None


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "out_len", "transpose", "symmetric", "interpret", "r_tile",
        "block_batch", "precision",
    ),
)
def chunked_block_apply(
    vals,  # [nb, mp, kp]
    row_chunk,  # [nb, mp // chunk] int32 (output row chunks in forward mode)
    col_chunk,  # [nb, kp // chunk] int32
    chunk: int,
    x,  # [n_in] or [n_in, r]
    out_len: int,
    *,
    transpose: bool = False,
    symmetric: bool = False,
    interpret: bool = False,
    r_tile: int | None = None,
    block_batch: int | None = None,
    precision=None,
):
    """Fused chunk-granular block product: returns [out_len] or [out_len, r].

    ``symmetric=True`` adds each block's mirrored (transposed) contribution
    in the same pass: y[rows] += B @ x[cols] AND y[cols] += B^T @ x[rows] --
    one HBM read per stored block (requires a square operand;
    ``transpose`` must be False).
    """
    if symmetric and transpose:
        raise ValueError(
            "symmetric fused pass is transpose-invariant; use transpose=False"
        )
    nb, mp, kp = vals.shape
    C = int(chunk)
    vec = x.ndim == 1
    xm = x[:, None] if vec else x
    n_in, r = xm.shape

    acc_dtype = jnp.float32 if vals.dtype != jnp.float64 else jnp.float64

    if r_tile is None or block_batch is None:
        cfg = choose_config(n_in, out_len, mp, kp, r, nb)
        if cfg is None:
            raise ValueError(
                "chunked_block_apply: panels exceed the VMEM budget "
                "(dispatch should have routed this bucket to the XLA engine)"
            )
        if r_tile is None:
            r_tile = cfg[0]
        if block_batch is None:
            block_batch = cfg[1]
    r_pad = _round_up(r, r_tile)

    out_chunk = row_chunk if not transpose else col_chunk
    in_chunk = col_chunk if not transpose else row_chunk
    in_extent = kp if not transpose else mp
    out_extent = mp if not transpose else kp
    # buffer safety padding; in symmetric mode both extents touch both buffers
    in_pad = max(mp, kp) if symmetric else in_extent
    out_pad = max(mp, kp) if symmetric else out_extent

    # pad x rows so chunk windows never leave the buffer; pad r to r_tile
    xm = jnp.pad(xm, ((0, in_pad), (0, r_pad - r)))
    if vals.dtype in (jnp.bfloat16, jnp.float16):
        xm = xm.astype(vals.dtype)  # keep both MXU operands low-precision
    else:
        xm = xm.astype(acc_dtype)
    n_steps = _cdiv(nb, block_batch)
    nb_pad = n_steps * block_batch
    if nb_pad != nb:
        vals = jnp.pad(vals, ((0, nb_pad - nb), (0, 0), (0, 0)))

    out_rows = out_len + out_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r_pad // r_tile, n_steps),
        in_specs=[
            pl.BlockSpec(
                (n_in + in_pad, r_tile), lambda j, s, *_: (0, j),
            ),
            pl.BlockSpec(
                (block_batch, mp, kp), lambda j, s, *_: (s, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, r_tile), lambda j, s, *_: (0, j),
        ),
    )

    # Mosaic lowers only DEFAULT/HIGHEST in-kernel; "high" runs as the
    # split-bf16 3-pass emulation (_dot3) -- same ~1e-6 accuracy class as
    # XLA's Precision.HIGH at half the passes of HIGHEST.
    split3 = (
        precision is not None
        and jax.lax.Precision(precision) == jax.lax.Precision.HIGH
        and acc_dtype == jnp.float32
        and vals.dtype == jnp.float32
    )
    kernel = functools.partial(
        _kernel,
        nb=nb,
        block_batch=block_batch,
        mp=mp,
        kp=kp,
        chunk=C,
        transpose=transpose,
        symmetric=symmetric,
        acc_dtype=acc_dtype,
        precision=(None if split3
                   else jax.lax.Precision(precision) if precision else None),
        split3=split3,
    )

    flops = 2 * nb * mp * kp * r_pad * (2 if symmetric else 1)
    bytes_accessed = (
        vals.size * vals.dtype.itemsize + xm.size * xm.dtype.itemsize
        + out_rows * r_pad * 4
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, r_pad), acc_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(out_chunk.astype(jnp.int32), in_chunk.astype(jnp.int32), xm, vals)

    y = y[:out_len, :r]
    return y[:, 0] if vec else y
