"""Panel Pallas kernel: one-launch SpMV over K-merged panel tiles.

Same streaming skeleton as the slab kernel (ops/pallas/slab_spmv.py) -- the
whole operand streams once as [TS, 8, 128] slabs, gather/scatter are
slab-level one-hot MXU matmuls -- but the tiles live in the panel-K space
of core/panel.py, which cuts padded/logical traffic from ~2.3-2.9x to
~1.3-1.6x on mixed-size contiguous populations (VERDICT r2 #1):

    xs    streamed [CW, 128] per slab: x row-gathered OUTSIDE the kernel at
          32-segment granularity (x32[segid] -- measured ~3 us where the
          element gather costs ~250 us, benchmarks/archive/proto_r3_gather.py)
    xg    = Cs @ xs               [TS,CW]@[CW,128]
    yf    = sum_k(V * xg)         VPU -> [TS, 8]
    y8   += Rs^T @ yf             into the VMEM row window
    (mirror plans additionally, from the SAME value read:)
    xr    = Rs @ x8win            [TS, 8] x at tile rows
    yt    = sum_m(V * xr)         VPU -> [TS, 128]
    ym[s] = Cs^T @ yt             per-slab mirror panel

Because panel segments map 1:1 onto rows of x.reshape(-1, 32) (same
lanes), the mirror panels map back with ONE one-hot segment matmul into
y.reshape(-1, 32): no scatter, no gather, overlap-safe.

The fused mirror pass realizes the one-read symmetric promise (the
reference reads each stored off-diagonal block twice,
/root/reference/src/symmetricblockmatrix.jl:394-418).  Diagonal blocks'
mirror products are computed but dropped by the map-back one-hot (their
segments have no target row), so the kernel needs no per-tile flags.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.panel import NSEG, SEG, PanelPlan
from ...core.strip import CC, RC

__all__ = ["panel_apply", "panel_device_arrays"]

HI = jax.lax.Precision.HIGHEST


def panel_device_arrays(plan: PanelPlan):
    """Device-ready leaves (map-back one-hot bf16: 0/1 exact)."""
    return (
        jnp.asarray(plan.vals),
        jnp.asarray(plan.rid8),
        jnp.asarray(plan.cid8),
        jnp.asarray(plan.segid),
        jnp.asarray(plan.b8),
        None if plan.omap is None else jnp.asarray(plan.omap,
                                                   dtype=jnp.bfloat16),
    )


def _onehots(rid_ref, cid_ref, RW, CW):
    """Build the scatter/gather one-hots from the streamed id vectors:
    R [RW, TS] (row window scatter) and CT [CW, TS] (= C^T, chunk gather).
    An iota compare per slab replaces ~1 MB of streamed one-hot matrices
    with two [1, TS] int vectors (measured equal MXU behavior; the dots
    contract CT on its first dim via dot_general, no transposes)."""
    ridv = rid_ref[0]                               # [1, TS] int32
    cidv = cid_ref[0]                               # [1, TS] int32
    TS = ridv.shape[-1]
    R = (jax.lax.broadcasted_iota(jnp.int32, (RW, TS), 0)
         == ridv).astype(jnp.float32)
    CT = (jax.lax.broadcasted_iota(jnp.int32, (CW, TS), 0)
          == cidv).astype(jnp.float32)
    return R, CT


def _dg0(a, b):
    """Contract a's dim 0 with b's dim 0: [K, M] x [K, N] -> [M, N]."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI)


def _pkern_plain(b8_ref, xs_ref, vals_ref, rid_ref, cid_ref, y8_ref,
                 *, RW, CW):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)

    V = vals_ref[:]                                 # [TS, 8, 128]
    R, CT = _onehots(rid_ref, cid_ref, RW, CW)
    base = b8_ref[s]
    xg = _dg0(CT, xs_ref[0])                        # [TS, 128]
    yf = jnp.sum(V * xg[:, None, :], axis=2)        # [TS, 8]
    y8_ref[pl.ds(base, RW), :] += jnp.dot(
        R, yf, preferred_element_type=jnp.float32, precision=HI)


def _pkern_mirror(b8_ref, xs_ref, x8_ref, vals_ref, rid_ref, cid_ref,
                  y8_ref, ym_ref, *, RW, CW):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)

    V = vals_ref[:]
    R, CT = _onehots(rid_ref, cid_ref, RW, CW)
    base = b8_ref[s]
    xg = _dg0(CT, xs_ref[0])
    yf = jnp.sum(V * xg[:, None, :], axis=2)
    y8_ref[pl.ds(base, RW), :] += jnp.dot(
        R, yf, preferred_element_type=jnp.float32, precision=HI)

    xw = x8_ref[pl.ds(base, RW), :]                 # [RW, 8]
    xr = _dg0(R, xw)                                # [TS, 8]
    yt = jnp.sum(V * xr[:, :, None], axis=1)        # [TS, 128]
    ym_ref[0] = jnp.dot(CT, yt, preferred_element_type=jnp.float32,
                        precision=HI)               # [CW, 128] per slab


def _gather_xs(x, segid, S, CW, NC32, ncols, grids_used):
    """Per-slab x panels via a 32-wide ROW gather (the fast gather).

    Source rows come from the plan's USED shifted segment grids (one
    roll op each beyond grid 0 -- the plan compacts the table and the
    shift-vs-grid0 choice is costed per population, core/panel.
    _best_shift_variant) plus a zero sentinel row."""
    pad = NC32 * SEG - ncols
    xp = jnp.pad(x, (0, pad)) if pad else x
    grids = [jnp.roll(xp, -g).reshape(NC32, SEG) if g else
             xp.reshape(NC32, SEG) for g in grids_used]
    x32 = jnp.concatenate(grids + [jnp.zeros((1, SEG), jnp.float32)])
    # [S*CW*NSEG, 32] -> [S, CW, 128]: row-major view, no data movement
    return x32[segid.reshape(-1)].reshape(S, CW, CC)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _launch(dev, x, *, meta, interpret):
    """meta = (S, TS, CW, RW, n8p, nrows, ncols, NC32, mirror, grids)."""
    S, TS, CW, RW, n8p, nrows, ncols, NC32, mirror, grids = meta
    vals, rid8, cid8, segid, b8, omap = dev
    xf = x.astype(jnp.float32)
    xs = _gather_xs(xf, segid, S, CW, NC32, ncols, grids)
    params = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size * (2 if mirror else 1),
            bytes_accessed=vals.size * 4 + (rid8.size + cid8.size) * 4
            + xs.size * 4 + n8p * RC * 4,
            transcendentals=0),
        interpret=interpret,
    )
    if mirror:
        x8pad = n8p * RC - nrows
        x8 = (jnp.pad(xf, (0, x8pad)) if x8pad else xf).reshape(n8p, RC)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, CW, CC), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
                pl.BlockSpec((TS, RC, CC), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
                pl.BlockSpec((1, CW, CC), lambda s, b: (s, 0, 0)),
            ],
        )
        y8, ym = pl.pallas_call(
            functools.partial(_pkern_mirror, RW=RW, CW=CW),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n8p, RC), jnp.float32),
                jax.ShapeDtypeStruct((S, CW, CC), jnp.float32),
            ],
            **params,
        )(b8, xs, x8, vals, rid8, cid8)
        y = y8.reshape(-1)[:nrows]
        # mirror map-back: panel segments -> rows of y.reshape(-1, 32),
        # one one-hot MXU matmul (overlaps sum; no scatter anywhere).
        # Round 5: shifted mirror grids emit one plane per grid; grid g's
        # plane lands at y indices offset by +g (pad-left, no wraparound).
        ym32 = ym.reshape(S * CW * NSEG, SEG)
        y32 = jnp.dot(omap.astype(jnp.float32).T, ym32,
                      preferred_element_type=jnp.float32,
                      precision=HI)                 # [NG*NC32, 32]
        for gi, g in enumerate(grids):
            plane = y32[gi * NC32:(gi + 1) * NC32].reshape(-1)
            if g:
                plane = jnp.pad(plane, (g, 0))
            y = y + plane[:nrows]
        return y.astype(x.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, CW, CC), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((TS, RC, CC), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
    )
    y8 = pl.pallas_call(
        functools.partial(_pkern_plain, RW=RW, CW=CW),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n8p, RC), jnp.float32),
        **params,
    )(b8, xs, vals, rid8, cid8)
    return y8.reshape(-1)[:nrows].astype(x.dtype)


def _xla_forward(dev, x, meta):
    """Reference-semantics XLA evaluation of the panel plan (also drives the
    VJP: the operator is linear, so jax.vjp of this pure-XLA path yields
    exact cotangents for both x and the tile values)."""
    S, TS, CW, RW, n8p, nrows, ncols, NC32, mirror, grids = meta
    vals, rid8, cid8, segid, b8, omap = dev
    xf = x.astype(jnp.float32)
    xs = _gather_xs(xf, segid, S, CW, NC32, ncols, grids)
    V = vals.reshape(S, TS, RC, CC)
    R = (jnp.arange(RW, dtype=jnp.int32)[None, :, None]
         == rid8).astype(jnp.float32)              # [S, RW, TS]
    C = (jnp.arange(CW, dtype=jnp.int32)[None, :, None]
         == cid8).astype(jnp.float32).transpose(0, 2, 1)   # [S, TS, CW]
    xg = jnp.einsum("stc,sck->stk", C, xs, precision=HI)
    yf = jnp.einsum("stmk,stk->stm", V, xg, precision=HI)
    upd = jnp.einsum("swt,stm->swm", R, yf, precision=HI)
    y8 = jnp.zeros((n8p + RW, RC), jnp.float32)
    for s in range(S):
        y8 = jax.lax.dynamic_update_slice(
            y8,
            jax.lax.dynamic_slice(
                y8, (b8[s], jnp.int32(0)), (RW, RC)) + upd[s],
            (b8[s], jnp.int32(0)))
    y = y8.reshape(-1)[:nrows]
    if mirror:
        x8pad = n8p * RC - nrows
        x8 = (jnp.pad(xf, (0, x8pad)) if x8pad else xf).reshape(n8p, RC)
        xw = jnp.stack([
            jax.lax.dynamic_slice(x8, (b8[s], jnp.int32(0)), (RW, RC))
            for s in range(S)])
        xr = jnp.einsum("swt,swm->stm", R, xw, precision=HI)
        yt = jnp.einsum("stmk,stm->stk", V, xr, precision=HI)
        ym = jnp.einsum("stc,stk->sck", C, yt, precision=HI)
        ym32 = ym.reshape(S * CW * NSEG, SEG)
        y32 = jnp.dot(omap.astype(jnp.float32).T, ym32, precision=HI)
        for gi, g in enumerate(grids):
            plane = y32[gi * NC32:(gi + 1) * NC32].reshape(-1)
            if g:
                plane = jnp.pad(plane, (g, 0))
            y = y + plane[:nrows]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _panel_vjp(dev, x, meta, interpret):
    return _launch(dev, x, meta=meta, interpret=interpret)


def _panel_vjp_fwd(dev, x, meta, interpret):
    return _launch(dev, x, meta=meta, interpret=interpret), (dev, x)


def _panel_vjp_bwd(meta, interpret, res, g):
    dev, x = res
    vals = dev[0]
    rest = dev[1:]
    _, pull = jax.vjp(
        lambda v, xx: _xla_forward((v,) + rest, xx, meta), vals, x)
    dvals, dx = pull(g)
    zero = lambda a: (None if a is None
                      else np.zeros(a.shape, dtype=jax.dtypes.float0))
    return ((dvals.astype(vals.dtype),) + tuple(zero(a) for a in rest), dx)


_panel_vjp.defvjp(_panel_vjp_fwd, _panel_vjp_bwd)


def panel_apply(plan: PanelPlan, dev, x, *, interpret: bool = False):
    """Apply the panel plan: y = A @ x.  Differentiable in x and values."""
    meta = (plan.S, plan.TS, plan.CW, plan.RW, plan.n8p, plan.nrows,
            plan.ncols, plan.NC32, plan.mirror, tuple(plan.grids_used))
    return _panel_vjp(dev, x, meta, interpret)


# ---------------------------------------------------------------------------
# Batched multi-operand SpMV (round 5): P same-structure products in ONE
# launch with grid (P, S).  One x-gather op chain serves all P products and
# the block pipeline prefetches product p+1's slabs during product p's
# compute -- the per-product op floors (~3 us of pad/roll/gather +
# launch) amortize over P (measured config2 25.6 -> 22.6 us/product,
# config3 20.5 -> 19.4; benchmarks/proto_r5_batchpanel.py).  Value
# streams stay distinct per product.
# ---------------------------------------------------------------------------


def _pkern_plain_b(b8_ref, xs_ref, vals_ref, rid_ref, cid_ref, y8_ref,
                   *, RW, CW):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)

    V = vals_ref[0]
    R, CT = _onehots(rid_ref[0], cid_ref[0], RW, CW)
    base = b8_ref[s]
    xg = _dg0(CT, xs_ref[0, 0])
    yf = jnp.sum(V * xg[:, None, :], axis=2)
    y8_ref[0, pl.ds(base, RW), :] += jnp.dot(
        R, yf, preferred_element_type=jnp.float32, precision=HI)


def _pkern_mirror_b(b8_ref, xs_ref, x8_ref, vals_ref, rid_ref, cid_ref,
                    y8_ref, ym_ref, *, RW, CW):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)

    V = vals_ref[0]
    R, CT = _onehots(rid_ref[0], cid_ref[0], RW, CW)
    base = b8_ref[s]
    xg = _dg0(CT, xs_ref[0, 0])
    yf = jnp.sum(V * xg[:, None, :], axis=2)
    y8_ref[0, pl.ds(base, RW), :] += jnp.dot(
        R, yf, preferred_element_type=jnp.float32, precision=HI)
    xw = x8_ref[0, pl.ds(base, RW), :]
    xr = _dg0(R, xw)
    yt = jnp.sum(V * xr[:, :, None], axis=1)
    ym_ref[0, 0] = jnp.dot(CT, yt, preferred_element_type=jnp.float32,
                           precision=HI)


# Above this source-row count XLA lowers the batched advanced-index
# gather x32[:, segid] to a slow path (measured configS, NC32=512 NG=3:
# 263 us/product vs 93 serial); per-product gathers of the same index
# set stay on the fast row-gather path (8.7 us each on configS).
_BATCHED_GATHER_ROWS = 1536


def _gather_xs_batched(xb, segid, P, S, CW, NC32, ncols, grids_used):
    """[P, n] -> [P, S, CW, CC]; one op chain for all P products when the
    batched gather stays on XLA's fast path, else per-product gathers."""
    pad = NC32 * SEG - ncols
    xp = jnp.pad(xb, ((0, 0), (0, pad))) if pad else xb
    planes = [jnp.roll(xp, -g, axis=1).reshape(P, NC32, SEG) if g else
              xp.reshape(P, NC32, SEG) for g in grids_used]
    x32 = jnp.concatenate(planes + [jnp.zeros((P, 1, SEG), jnp.float32)],
                          axis=1)
    if x32.shape[1] <= _BATCHED_GATHER_ROWS:
        return x32[:, segid.reshape(-1)].reshape(P, S, CW, CC)
    idx = segid.reshape(-1)
    return jnp.stack([x32[p][idx] for p in range(P)]).reshape(P, S, CW, CC)


def _launch_batched(shared, vals_b, xb, *, meta, interpret):
    """meta as in _launch plus leading P; shared = (rid8, cid8, segid,
    b8, omap) from the structure-defining plan."""
    (P, S, TS, CW, RW, n8p, nrows, ncols, NC32, mirror, grids) = meta
    rid8, cid8, segid, b8, omap = shared
    xf = xb.astype(jnp.float32)
    xs = _gather_xs_batched(xf, segid, P, S, CW, NC32, ncols, grids)
    params = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals_b.size * (2 if mirror else 1),
            bytes_accessed=vals_b.size * 4 + xs.size * 4
            + P * n8p * RC * 4,
            transcendentals=0),
        interpret=interpret,
    )
    if mirror:
        x8pad = n8p * RC - nrows
        x8 = (jnp.pad(xf, ((0, 0), (0, x8pad))) if x8pad else xf
              ).reshape(P, n8p, RC)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(P, S),
            in_specs=[
                pl.BlockSpec((1, 1, CW, CC), lambda p, s, b: (p, s, 0, 0)),
                pl.BlockSpec((1, n8p, RC), lambda p, s, b: (p, 0, 0)),
                pl.BlockSpec((1, TS, RC, CC),
                             lambda p, s, b: (p, s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda p, s, b: (s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda p, s, b: (s, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, n8p, RC), lambda p, s, b: (p, 0, 0)),
                pl.BlockSpec((1, 1, CW, CC),
                             lambda p, s, b: (p, s, 0, 0)),
            ],
        )
        y8, ym = pl.pallas_call(
            functools.partial(_pkern_mirror_b, RW=RW, CW=CW),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((P, n8p, RC), jnp.float32),
                       jax.ShapeDtypeStruct((P, S, CW, CC), jnp.float32)],
            **params,
        )(b8, xs, x8, vals_b, rid8, cid8)
        y = y8.reshape(P, -1)[:, :nrows]
        ym32 = ym.reshape(P, S * CW * NSEG, SEG)
        y32 = jnp.einsum("rc,prk->pck", omap.astype(jnp.float32), ym32,
                         precision=HI)
        for gi, g in enumerate(grids):
            plane = y32[:, gi * NC32:(gi + 1) * NC32].reshape(P, -1)
            if g:
                plane = jnp.pad(plane, ((0, 0), (g, 0)))
            y = y + plane[:, :nrows]
        return y.astype(xb.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(P, S),
        in_specs=[
            pl.BlockSpec((1, 1, CW, CC), lambda p, s, b: (p, s, 0, 0)),
            pl.BlockSpec((1, TS, RC, CC), lambda p, s, b: (p, s, 0, 0)),
            pl.BlockSpec((1, 1, TS), lambda p, s, b: (s, 0, 0)),
            pl.BlockSpec((1, 1, TS), lambda p, s, b: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n8p, RC), lambda p, s, b: (p, 0, 0)),
    )
    y8 = pl.pallas_call(
        functools.partial(_pkern_plain_b, RW=RW, CW=CW),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, n8p, RC), jnp.float32),
        **params,
    )(b8, xs, vals_b, rid8, cid8)
    return y8.reshape(P, -1)[:, :nrows].astype(xb.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _panel_batched_vjp(packed, xb, meta, interpret):
    shared, vals_b = packed
    return _launch_batched(shared, vals_b, xb, meta=meta,
                           interpret=interpret)


def _panel_batched_fwd(packed, xb, meta, interpret):
    return _panel_batched_vjp(packed, xb, meta, interpret), (packed, xb)


def _panel_batched_bwd(meta, interpret, res, g):
    (shared, vals_b), xb = res
    rid8, cid8, segid, b8, omap = shared
    P = meta[0]
    meta1 = meta[1:]
    dvals, dx = [], []
    for p in range(P):
        dev_p = (vals_b[p], rid8, cid8, segid, b8, omap)
        _, pull = jax.vjp(
            lambda v, xx, dev_p=dev_p: _xla_forward(
                (v,) + dev_p[1:], xx, meta1), dev_p[0], xb[p])
        dv, dxp = pull(g[p])
        dvals.append(dv)
        dx.append(dxp)
    zero = lambda a: (None if a is None
                      else np.zeros(a.shape, dtype=jax.dtypes.float0))
    dshared = tuple(zero(a) for a in shared)
    return ((dshared, jnp.stack(dvals).astype(vals_b.dtype)),
            jnp.stack(dx).astype(xb.dtype))


_panel_batched_vjp.defvjp(_panel_batched_fwd, _panel_batched_bwd)


def panel_apply_batched(plan: PanelPlan, shared, vals_b, xb, *,
                        interpret: bool = False):
    """P same-structure products in one launch; xb: [P, n]."""
    P = int(xb.shape[0])
    meta = (P, plan.S, plan.TS, plan.CW, plan.RW, plan.n8p, plan.nrows,
            plan.ncols, plan.NC32, plan.mirror, tuple(plan.grids_used))
    return _panel_batched_vjp((shared, vals_b), xb, meta, interpret)
