"""Slab Pallas kernel: one-launch SpMV over a uniform [8,128]-tile stream.

The hot loop of the reference is one BLAS gemv per dense block on views
(/root/reference/src/blockmatrix.jl:236-242); its symmetric kernel reads each
stored off-diagonal block twice (symmetricblockmatrix.jl:394-418).  This
kernel is the TPU-native replacement: the whole operand streams from HBM
exactly once as [TS, 8, 128] slabs (Mosaic double-buffers the DMA), and all
gather/scatter is expressed as slab-level one-hot MXU matmuls -- measured
~5x cheaper than XLA row gathers and ~15x cheaper than XLA scatter-adds on
this population (benchmarks/archive/proto_ceiling.py):

    xg    = Cs @ x128         gather: [TS,NC]@[NC,128]
    yf    = sum_k(V * xg)     VPU multiply + lane reduce -> [TS, 8]
    y8   += Rs^T @ yf         scatter: [RW,TS]@[TS,8] into a VMEM window
    xr    = (Rs @ x8win)*flag mirror gather (reuses Rs)    [TS, 8]
    yt    = sum_m(V * xr)     VPU -> [TS, 128]
    y128 += Cs^T @ yt         mirror scatter (reuses Cs)   [NC, 128]

The mirror contribution implements the fused symmetric pass: both MXU/VPU
contributions of a stored off-diagonal block issue from ONE VMEM-resident
read of its tiles.  x and y stay VMEM-resident across the whole grid; there
is no per-tile control flow anywhere.

One-hot operators are stored bf16 (0/1 exact) to halve their HBM traffic and
cast to f32 in VMEM; all dots run at HIGHEST precision (f32-exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.strip import CC, RC, RW, StripPlan

__all__ = ["slab_apply", "plan_device_arrays"]

HI = jax.lax.Precision.HIGHEST


def plan_device_arrays(plan: StripPlan):
    """Device-ready leaves for a plan (one-hots in bf16: 0/1 is exact)."""
    return (
        jnp.asarray(plan.vals),
        jnp.asarray(plan.rs, dtype=jnp.bfloat16),
        jnp.asarray(plan.cs, dtype=jnp.bfloat16),
        jnp.asarray(plan.flag),
        jnp.asarray(plan.b8),
    )


def _kernel_mirror(b8_ref, x128_ref, x8_ref, vals_ref, rs_ref, cs_ref,
                   fl_ref, y8_ref, y128_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)
        y128_ref[:] = jnp.zeros_like(y128_ref)

    V = vals_ref[:]                       # [TS, 8, 128]
    TS = V.shape[0]
    R = rs_ref[0].astype(jnp.float32)     # [RW, TS]
    C = cs_ref[0].astype(jnp.float32)     # [TS, NC]
    base = b8_ref[s]

    xg = jnp.dot(C, x128_ref[:], preferred_element_type=jnp.float32,
                 precision=HI)            # [TS, 128]
    yf = jnp.sum(V * xg[:, None, :], axis=2)                   # [TS, 8]
    y8_ref[pl.ds(base, RW), :] += jnp.dot(
        R, yf, preferred_element_type=jnp.float32, precision=HI)

    xw = x8_ref[pl.ds(base, RW), :]                            # [RW, 8]
    xr = jnp.dot(R.T, xw, preferred_element_type=jnp.float32,
                 precision=HI) * fl_ref[0].reshape(TS, 1)      # [TS, 8]
    yt = jnp.sum(V * xr[:, :, None], axis=1)                   # [TS, 128]
    y128_ref[:] += jnp.dot(C.T, yt, preferred_element_type=jnp.float32,
                           precision=HI)


def _kernel_plain(b8_ref, x128_ref, vals_ref, rs_ref, cs_ref, y8_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)

    V = vals_ref[:]
    R = rs_ref[0].astype(jnp.float32)
    C = cs_ref[0].astype(jnp.float32)
    base = b8_ref[s]
    xg = jnp.dot(C, x128_ref[:], preferred_element_type=jnp.float32,
                 precision=HI)
    yf = jnp.sum(V * xg[:, None, :], axis=2)
    y8_ref[pl.ds(base, RW), :] += jnp.dot(
        R, yf, preferred_element_type=jnp.float32, precision=HI)


# ---------------------------------------------------------------------------
# Core-split variants: a PARALLEL leading grid dimension for multi-core
# (megacore) chips.  Each core owns a private copy of the output window
# (out block indexed by the core id, so Mosaic sees disjoint writes) and a
# contiguous half of the slab stream; the halves are summed outside.  No
# coloring is needed at this level -- the private copies make the cores
# conflict-free by construction, the TPU-idiomatic replacement for the
# reference's colored racing threads (blockmatrix.jl:232-243).  On
# single-TensorCore chips (v5e: num_cores == 1) the parallel dimension
# degenerates to sequential execution, so the split is gated off by
# default (see _resolve_cores).
# ---------------------------------------------------------------------------


def _kernel_mirror_mc(b8_ref, x128_ref, x8_ref, vals_ref, rs_ref, cs_ref,
                      fl_ref, y8_ref, y128_ref, *, Sh, S):
    c = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)
        y128_ref[:] = jnp.zeros_like(y128_ref)

    @pl.when(c * Sh + s < S)  # the last core's tail steps are no-ops
    def _():
        V = vals_ref[:]
        TS = V.shape[0]
        R = rs_ref[0].astype(jnp.float32)
        C = cs_ref[0].astype(jnp.float32)
        base = b8_ref[jnp.minimum(c * Sh + s, S - 1)]

        xg = jnp.dot(C, x128_ref[:], preferred_element_type=jnp.float32,
                     precision=HI)
        yf = jnp.sum(V * xg[:, None, :], axis=2)
        y8_ref[0, pl.ds(base, RW), :] += jnp.dot(
            R, yf, preferred_element_type=jnp.float32, precision=HI)

        xw = x8_ref[pl.ds(base, RW), :]
        xr = jnp.dot(R.T, xw, preferred_element_type=jnp.float32,
                     precision=HI) * fl_ref[0].reshape(TS, 1)
        yt = jnp.sum(V * xr[:, :, None], axis=1)
        y128_ref[0] += jnp.dot(C.T, yt, preferred_element_type=jnp.float32,
                               precision=HI)


def _kernel_plain_mc(b8_ref, x128_ref, vals_ref, rs_ref, cs_ref, y8_ref,
                     *, Sh, S):
    c = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)

    @pl.when(c * Sh + s < S)
    def _():
        V = vals_ref[:]
        R = rs_ref[0].astype(jnp.float32)
        C = cs_ref[0].astype(jnp.float32)
        base = b8_ref[jnp.minimum(c * Sh + s, S - 1)]
        xg = jnp.dot(C, x128_ref[:], preferred_element_type=jnp.float32,
                     precision=HI)
        yf = jnp.sum(V * xg[:, None, :], axis=2)
        y8_ref[0, pl.ds(base, RW), :] += jnp.dot(
            R, yf, preferred_element_type=jnp.float32, precision=HI)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _launch(dev, x, *, meta, interpret):
    """meta = (S, TS, NC, n8p, nrows, ncols, mirror, cores)."""
    S, TS, NC, n8p, nrows, ncols, mirror, cores = meta
    vals, rs, cs, flag, b8 = dev
    xpad = NC * CC - x.shape[0]
    xm = jnp.pad(x, (0, xpad)) if xpad else x
    x128 = xm.reshape(NC, CC)
    flops = 2 * vals.size * (2 if mirror else 1)
    bytes_accessed = (vals.size * 4 + rs.size * 2 + cs.size * 2
                      + (NC * CC + n8p * RC) * 4)
    if cores > 1:
        return _launch_mc(dev, x128, meta=meta, interpret=interpret,
                          flops=flops, bytes_accessed=bytes_accessed)
    params = dict(
        grid=(S,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0,
        ),
        interpret=interpret,
    )
    if mirror:
        # square: x8 view of the same padded input, y = y8 + y128
        x8pad = n8p * RC - x.shape[0]
        x8 = (jnp.pad(x, (0, x8pad)) if x8pad else x).reshape(n8p, RC)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((NC, CC), lambda s, b: (0, 0)),
                pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
                pl.BlockSpec((TS, RC, CC), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, RW, TS), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, TS, NC), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
                pl.BlockSpec((NC, CC), lambda s, b: (0, 0)),
            ],
        )
        y8, y128 = pl.pallas_call(
            _kernel_mirror,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n8p, RC), jnp.float32),
                jax.ShapeDtypeStruct((NC, CC), jnp.float32),
            ],
            **{k: v for k, v in params.items() if k != "grid"},
        )(b8, x128, x8, vals, rs, cs, flag)
        n = nrows
        return (y8.reshape(-1)[:n]
                + y128.reshape(-1)[:n]).astype(x.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((NC, CC), lambda s, b: (0, 0)),
            pl.BlockSpec((TS, RC, CC), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, RW, TS), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, TS, NC), lambda s, b: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
    )
    y8 = pl.pallas_call(
        _kernel_plain,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n8p, RC), jnp.float32),
        **{k: v for k, v in params.items() if k != "grid"},
    )(b8, x128, vals, rs, cs)
    return y8.reshape(-1)[: nrows].astype(x.dtype)


def _launch_mc(dev, x128, *, meta, interpret, flops, bytes_accessed):
    """Core-split launch: grid (cores, ceil(S/cores)) with a PARALLEL
    leading dimension; each core writes a private output copy (see the
    core-split kernel comment above)."""
    S, TS, NC, n8p, nrows, ncols, mirror, cores = meta
    vals, rs, cs, flag, b8 = dev
    Sh = -(-S // cores)
    x = x128  # [NC, CC]

    def slab_ix(c, s, b):
        return (jnp.minimum(c * Sh + s, S - 1), 0, 0)

    params = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0,
        ),
        interpret=interpret,
    )
    if mirror:
        x8pad = n8p * RC - ncols
        xflat = x.reshape(-1)[:ncols]
        x8 = (jnp.pad(xflat, (0, x8pad)) if x8pad else xflat).reshape(
            n8p, RC)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cores, Sh),
            in_specs=[
                pl.BlockSpec((NC, CC), lambda c, s, b: (0, 0)),
                pl.BlockSpec((n8p, RC), lambda c, s, b: (0, 0)),
                pl.BlockSpec((TS, RC, CC), slab_ix),
                pl.BlockSpec((1, RW, TS), slab_ix),
                pl.BlockSpec((1, TS, NC), slab_ix),
                pl.BlockSpec((1, 1, TS), slab_ix),
            ],
            out_specs=[
                pl.BlockSpec((1, n8p, RC), lambda c, s, b: (c, 0, 0)),
                pl.BlockSpec((1, NC, CC), lambda c, s, b: (c, 0, 0)),
            ],
        )
        y8, y128 = pl.pallas_call(
            functools.partial(_kernel_mirror_mc, Sh=Sh, S=S),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((cores, n8p, RC), jnp.float32),
                jax.ShapeDtypeStruct((cores, NC, CC), jnp.float32),
            ],
            **params,
        )(b8, x, x8, vals, rs, cs, flag)
        n = nrows
        return (y8.sum(axis=0).reshape(-1)[:n]
                + y128.sum(axis=0).reshape(-1)[:n]).astype(x.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cores, Sh),
        in_specs=[
            pl.BlockSpec((NC, CC), lambda c, s, b: (0, 0)),
            pl.BlockSpec((TS, RC, CC), slab_ix),
            pl.BlockSpec((1, RW, TS), slab_ix),
            pl.BlockSpec((1, TS, NC), slab_ix),
        ],
        out_specs=pl.BlockSpec((1, n8p, RC), lambda c, s, b: (c, 0, 0)),
    )
    y8 = pl.pallas_call(
        functools.partial(_kernel_plain_mc, Sh=Sh, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cores, n8p, RC), jnp.float32),
        **params,
    )(b8, x, vals, rs, cs)
    return y8.sum(axis=0).reshape(-1)[:nrows].astype(x.dtype)


# ---------------------------------------------------------------------------
# custom VJP: pallas_call has no AD rule; the operator is linear so the
# cotangents are exact.  The backward pass uses plain-XLA one-hot matmuls
# (correct on every backend; the forward slab kernel stays the fast path).
# ---------------------------------------------------------------------------


def _xla_forward(dev, x, meta):
    """Reference-semantics XLA evaluation of the slab plan (also the bwd)."""
    S, TS, NC, n8p, nrows, ncols, mirror = meta[:7]
    vals, rs, cs, flag, b8 = dev
    xpad = NC * CC - x.shape[0]
    xm = jnp.pad(x, (0, xpad)) if xpad else x
    x128 = xm.reshape(NC, CC)
    V = vals.reshape(S, TS, RC, CC)
    R = rs.astype(jnp.float32)
    C = cs.astype(jnp.float32)
    xg = jnp.einsum("stc,ck->stk", C, x128, precision=HI)
    yf = jnp.einsum("stmk,stk->stm", V, xg, precision=HI)
    upd = jnp.einsum("swt,stm->swm", R, yf, precision=HI)        # [S, RW, 8]
    y8 = jnp.zeros((n8p + RW, RC), jnp.float32)
    for s in range(S):
        y8 = jax.lax.dynamic_update_slice(
            y8, jax.lax.dynamic_slice(y8, (b8[s], jnp.int32(0)), (RW, RC)) + upd[s],
            (b8[s], jnp.int32(0)))
    y = y8.reshape(-1)[: nrows]
    if mirror:
        x8pad = n8p * RC - x.shape[0]
        x8 = (jnp.pad(x, (0, x8pad)) if x8pad else x).reshape(n8p, RC)
        xw = jnp.stack([
            jax.lax.dynamic_slice(x8, (b8[s], jnp.int32(0)), (RW, RC)) for s in range(S)
        ])                                                        # [S, RW, 8]
        xr = jnp.einsum("swt,swm->stm", R, xw, precision=HI) * flag.reshape(
            S, TS, 1)
        yt = jnp.einsum("stmk,stm->stk", V, xr, precision=HI)
        y128 = jnp.einsum("stc,stk->ck", C, yt, precision=HI)
        y = y + y128.reshape(-1)[: nrows]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _slab_vjp(dev, x, meta, interpret):
    return _launch(dev, x, meta=meta, interpret=interpret)


def _slab_vjp_fwd(dev, x, meta, interpret):
    return _launch(dev, x, meta=meta, interpret=interpret), (dev, x)


def _slab_vjp_bwd(meta, interpret, res, g):
    dev, x = res
    S, TS, NC, n8p, nrows, ncols, mirror = meta[:7]
    vals, rs, cs, flag, b8 = dev
    R = rs.astype(jnp.float32)
    C = cs.astype(jnp.float32)

    def chunks128(v):
        pad = NC * CC - v.shape[0]
        return (jnp.pad(v, (0, pad)) if pad else v).reshape(NC, CC)

    def chunks8(v):
        pad = n8p * RC - v.shape[0]
        return (jnp.pad(v, (0, pad)) if pad else v).reshape(n8p, RC)

    def windows8(v8):
        return jnp.stack([
            jax.lax.dynamic_slice(v8, (b8[s], jnp.int32(0)), (RW, RC)) for s in range(S)
        ])

    V = vals.reshape(S, TS, RC, CC)
    gr = jnp.einsum("swt,swm->stm", R, windows8(chunks8(g)),
                    precision=HI)                       # g at tile rows
    xc = jnp.einsum("stc,ck->stk", C, chunks128(x), precision=HI)
    # dV = g_rows (x) x_cols (+ mirror: x_rows (x) g_cols per flagged tile)
    dV = jnp.einsum("stm,stk->stmk", gr, xc, precision=HI)
    # dx: transpose contribution of every tile: dx_cols += V^T g_rows
    dx128 = jnp.einsum("stc,stk->ck", C,
                       jnp.einsum("stmk,stm->stk", V, gr, precision=HI),
                       precision=HI)
    dx = dx128.reshape(-1)[: ncols]
    if mirror:
        # mirror writes y[cols(t)] += V_t^T x[rows(t)] for flagged tiles, so
        #   dV_t   += flag * x_rows(t) (x) g_cols(t)
        #   dx[rows(t)] += flag * V_t g_cols(t)
        fl = flag.reshape(S, TS, 1)
        xrw = jnp.einsum("swt,swm->stm", R, windows8(chunks8(x)),
                         precision=HI)                  # x at tile rows
        gc = jnp.einsum("stc,ck->stk", C, chunks128(g), precision=HI)
        dV = dV + jnp.einsum("stm,stk->stmk", xrw, gc,
                             precision=HI) * fl[..., None]
        yf = jnp.einsum("stmk,stk->stm", V, gc, precision=HI) * fl
        upd = jnp.einsum("swt,stm->swm", R, yf, precision=HI)
        acc = jnp.zeros((n8p + RW, RC), jnp.float32)
        for s in range(S):
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (b8[s], jnp.int32(0)), (RW, RC)) + upd[s],
                (b8[s], jnp.int32(0)))
        dx = dx + acc.reshape(-1)[: ncols]
    dvals = dV.reshape(S * TS, RC, CC).astype(vals.dtype)
    zero = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return ((dvals, zero(rs), zero(cs), zero(flag), zero(b8)),
            dx.astype(g.dtype))


_slab_vjp.defvjp(_slab_vjp_fwd, _slab_vjp_bwd)


def _resolve_cores(interpret: bool) -> int:
    """Cores for the parallel grid split.  Default: the chip's TensorCore
    count (v4/v5p: 2 -> megacore split; v5e: 1 -> single sequential grid,
    since a parallel dimension cannot speed up a one-core chip).
    BST_SLAB_CORES overrides (e.g. =2 to exercise the split anywhere)."""
    import os
    import warnings

    env = os.environ.get("BST_SLAB_CORES")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            warnings.warn(
                f"BST_SLAB_CORES={env!r} is not an int; ignoring override"
            )
    if interpret:
        return 1
    try:
        dev = jax.devices()[0]
        nc = getattr(dev, "num_cores", None)
        if nc:
            return max(1, int(nc))
        # PjRt device objects do not reliably expose num_cores; fall back
        # to the known megacore generations by device_kind string
        kind = str(getattr(dev, "device_kind", "")).lower()
        if "v4" in kind or "v5p" in kind or ("v5" in kind
                                             and "lite" not in kind
                                             and "e" not in kind):
            return 2
        return 1
    except Exception:
        return 1


def slab_apply(plan: StripPlan, dev, x, *, interpret: bool = False):
    """Apply the slab plan: y = A @ x ([nrows] from [ncols]).

    ``dev`` are the device leaves from :func:`plan_device_arrays` (callers
    cache them).  Differentiable in both ``x`` and the tile values.
    """
    cores = min(_resolve_cores(interpret), plan.S)
    meta = (plan.S, plan.TS, plan.NC, plan.n8p, plan.nrows, plan.ncols,
            plan.mirror, cores)
    return _slab_vjp(dev, x, meta, interpret)
