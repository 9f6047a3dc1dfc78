"""Panel v2 Pallas kernels: SEG-parametric one-launch SpMV.

Two kernels over the Panel2Plan (core/panel2.py):

* ``fwd``  -- forward-only products.
* ``sym``  -- the fused symmetric pass: one value read per stored block
  feeds the forward AND the mirrored contribution (the reference reads
  each stored off-diagonal twice,
  /root/reference/src/symmetricblockmatrix.jl:394-418).  The mirrored
  segment map-back accumulates into a VMEM-resident second output via an
  in-kernel iota one-hot -- no streamed map-back matrix, no outside
  map-back op (both existed in v1).

x is gathered OUTSIDE the kernel, but v2's pinned single-grid covers make
that one plain row gather over ``x.reshape(-1, seg)`` -- v1's four
shifted grids cost 3 rolls + a concat on top.

Design history (benchmarks/archive/proto_r4_{bound,bisect,mbisect}.py, all
measured on the chip and REJECTED -- the shipped kernels keep v1's
per-tile HIGHEST-precision contraction math:
  - MXU offload of the mirrored contraction: 2x worse (f32-exact matmul
    passes cost far more than their MAC count suggests);
  - rid-pair pre-reduction of the forward products: pair padding
    inflates the stream more than the VPU savings are worth;
  - one-hot matmuls as three 1-pass bf16 products: slower than a single
    HIGHEST matmul (Mosaic's HIGHEST lowering beats manual splitting);
  - gathering x inside the kernel via per-subsegment one-hots: the
    NSEG-iteration loop of small matmuls costs more than the outside
    gather it replaces.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.panel2 import Panel2Plan
from ...core.strip import CC, RC

__all__ = ["panel2_apply", "panel2_device_arrays"]


def panel2_device_arrays(plan: Panel2Plan):
    """Device-ready leaves.  The mirror target table is stored
    [S, NSEG, CW]: Mosaic cannot relayout [CW*NSEG, seg] <-> [CW, CC]
    inside a kernel, so the map-back loops over NSEG subsegments with
    lane-sliced operands."""
    nsg = plan.nseg
    dev = {
        "vals": jnp.asarray(plan.vals),
        "rid8": jnp.asarray(plan.rid8),
        "cid8": jnp.asarray(plan.cid8),
        "segid": jnp.asarray(plan.segid),
        "b8": jnp.asarray(plan.b8),
    }
    if plan.mirror:
        dev["tgt"] = jnp.asarray(
            plan.tgt.reshape(plan.S, plan.CW, nsg)
            .transpose(0, 2, 1).copy())
    return dev


HI = jax.lax.Precision.HIGHEST


def _onehots(rid_ref, cid_ref, RW, CW, TS):
    R = (jax.lax.broadcasted_iota(jnp.int32, (RW, TS), 0)
         == rid_ref[0]).astype(jnp.float32)
    CT = (jax.lax.broadcasted_iota(jnp.int32, (CW, TS), 0)
          == cid_ref[0]).astype(jnp.float32)
    return R, CT


def _dg0(a, b):
    """Contract dim 0 with dim 0: [K, M] x [K, N] -> [M, N]."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=HI)


def _k_fwd(b8_ref, xs_ref, vals_ref, rid_ref, cid_ref, y8_ref, *, RW, CW):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)

    V = vals_ref[:]
    TS = V.shape[0]
    R, CT = _onehots(rid_ref, cid_ref, RW, CW, TS)
    base = b8_ref[s]
    xg = _dg0(CT, xs_ref[0])                        # [TS, CC]
    yf = jnp.sum(V * xg[:, None, :], axis=2)        # [TS, RC]
    y8_ref[pl.ds(base, RW), :] += _dot(R, yf)


def _k_sym(b8_ref, xs_ref, x8_ref, vals_ref, rid_ref, cid_ref,
           tgt_ref, y8_ref, ym32_ref, *, RW, CW, seg, NYp):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)
        ym32_ref[:] = jnp.zeros_like(ym32_ref)

    V = vals_ref[:]
    TS = V.shape[0]
    R, CT = _onehots(rid_ref, cid_ref, RW, CW, TS)
    base = b8_ref[s]
    xg = _dg0(CT, xs_ref[0])
    yf = jnp.sum(V * xg[:, None, :], axis=2)
    y8_ref[pl.ds(base, RW), :] += _dot(R, yf)

    # mirrored contribution (one read of V); map back onto rows of
    # y.reshape(-1, seg) via per-subsegment iota one-hots
    xw = x8_ref[pl.ds(base, RW), :]
    xr = _dg0(R, xw)                                # [TS, RC]
    yt = jnp.sum(V * xr[:, :, None], axis=1)        # [TS, CC]
    ym = _dot(CT, yt)                               # [CW, CC]
    nsg = CC // seg
    acc = None
    for sub in range(nsg):
        tg = tgt_ref[0, sub]
        OMT = (jax.lax.broadcasted_iota(jnp.int32, (NYp, CW), 0)
               == tg[None, :]).astype(jnp.float32)
        part = _dot(OMT, ym[:, sub * seg:(sub + 1) * seg])
        acc = part if acc is None else acc + part
    ym32_ref[:] += acc


def _gather_xs2(x, segid, S, CW, NC, seg, ncols):
    """Per-slab x panels: one row gather over x.reshape(-1, seg) plus a
    zero sentinel row (pinned single-grid covers need no shifted grids)."""
    pad = NC * seg - ncols
    xp = jnp.pad(x, (0, pad)) if pad else x
    X = jnp.concatenate([xp.reshape(NC, seg),
                         jnp.zeros((1, seg), jnp.float32)])
    return X[segid.reshape(-1)].reshape(S, CW, CC)


def _meta(plan: Panel2Plan):
    return (plan.S, plan.TS, plan.CW, plan.RW, plan.n8p, plan.nrows,
            plan.ncols, plan.NC, plan.seg, plan.mirror)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _launch(dev, x, *, meta, interpret):
    S, TS, CW, RW, n8p, nrows, ncols, NC, seg, mirror = meta
    nsg = CC // seg
    vals, rid8, cid8, b8 = (dev["vals"], dev["rid8"], dev["cid8"], dev["b8"])
    xf = x.astype(jnp.float32)
    params = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size * (2 if mirror else 1),
            bytes_accessed=vals.size * 4 + n8p * RC * 4,
            transcendentals=0),
        interpret=interpret,
    )
    xs = _gather_xs2(xf, dev["segid"], S, CW, NC, seg, ncols)
    x_spec = pl.BlockSpec((1, CW, CC), lambda s, b: (s, 0, 0))
    if not mirror:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[
                x_spec,
                pl.BlockSpec((TS, RC, CC), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
            ],
            out_specs=pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
        )
        y8 = pl.pallas_call(
            functools.partial(_k_fwd, RW=RW, CW=CW),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n8p, RC), jnp.float32),
            **params,
        )(b8, xs, vals, rid8, cid8)
        y = y8.reshape(-1)
        if y.shape[0] != nrows:
            y = y[:nrows]
        return y.astype(x.dtype)

    n_yseg = -(-nrows // seg)
    NYp = -(-n_yseg // 8) * 8
    x8pad = n8p * RC - nrows
    x8 = (jnp.pad(xf, (0, x8pad)) if x8pad else xf).reshape(n8p, RC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            x_spec,
            pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
            pl.BlockSpec((TS, RC, CC), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, nsg, CW), lambda s, b: (s, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
            pl.BlockSpec((NYp, seg), lambda s, b: (0, 0)),
        ],
    )
    y8, ym32 = pl.pallas_call(
        functools.partial(_k_sym, RW=RW, CW=CW, seg=seg, NYp=NYp),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n8p, RC), jnp.float32),
                   jax.ShapeDtypeStruct((NYp, seg), jnp.float32)],
        **params,
    )(b8, xs, x8, vals, rid8, cid8, dev["tgt"])
    y = y8.reshape(-1)[:nrows] + ym32.reshape(-1)[:nrows]
    return y.astype(x.dtype)


def _xla_forward(dev, x, meta):
    """Reference-semantics XLA evaluation (drives the exact VJP)."""
    S, TS, CW, RW, n8p, nrows, ncols, NC, seg, mirror = meta
    nsg = CC // seg
    vals, rid8, cid8, b8 = (dev["vals"], dev["rid8"], dev["cid8"], dev["b8"])
    xf = x.astype(jnp.float32)
    xs = _gather_xs2(xf, dev["segid"], S, CW, NC, seg, ncols)
    V = vals.reshape(S, TS, RC, CC)
    R = (jnp.arange(RW, dtype=jnp.int32)[None, :, None]
         == rid8).astype(jnp.float32)              # [S, RW, TS]
    C = (jnp.arange(CW, dtype=jnp.int32)[None, :, None]
         == cid8).astype(jnp.float32).transpose(0, 2, 1)   # [S, TS, CW]
    HIP = jax.lax.Precision.HIGHEST
    xg = jnp.einsum("stc,sck->stk", C, xs, precision=HIP)
    yf = jnp.einsum("stmk,stk->stm", V, xg, precision=HIP)
    upd = jnp.einsum("swt,stm->swm", R, yf, precision=HIP)
    y8 = jnp.zeros((n8p + RW, RC), jnp.float32)
    for s in range(S):
        y8 = jax.lax.dynamic_update_slice(
            y8,
            jax.lax.dynamic_slice(
                y8, (b8[s], jnp.int32(0)), (RW, RC)) + upd[s],
            (b8[s], jnp.int32(0)))
    y = y8.reshape(-1)[:nrows]
    if mirror:
        n_yseg = -(-nrows // seg)
        NYp = -(-n_yseg // 8) * 8
        x8pad = n8p * RC - nrows
        x8 = (jnp.pad(xf, (0, x8pad)) if x8pad else xf).reshape(n8p, RC)
        xw = jnp.stack([
            jax.lax.dynamic_slice(x8, (b8[s], jnp.int32(0)), (RW, RC))
            for s in range(S)])
        xr = jnp.einsum("swt,swm->stm", R, xw, precision=HIP)
        yt = jnp.einsum("stmk,stm->stk", V, xr, precision=HIP)
        ym = jnp.einsum("stc,stk->sck", C, yt, precision=HIP)
        ymseg = ym.reshape(S, CW * nsg, seg)
        tgt_j = dev["tgt"].transpose(0, 2, 1).reshape(S, CW * nsg)
        OH = (tgt_j[:, :, None]
              == jnp.arange(NYp, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.float32)
        y32 = jnp.einsum("sjq,sjl->ql", OH, ymseg, precision=HIP)
        y = y + y32.reshape(-1)[:nrows]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _panel2_vjp(dev, x, meta, interpret):
    return _launch(dev, x, meta=meta, interpret=interpret)


def _panel2_vjp_fwd(dev, x, meta, interpret):
    return _launch(dev, x, meta=meta, interpret=interpret), (dev, x)


def _panel2_vjp_bwd(meta, interpret, res, g):
    dev, x = res
    fkeys = [k for k, v in dev.items() if v.dtype == jnp.float32]
    rest = {k: v for k, v in dev.items() if k not in fkeys}
    _, pull = jax.vjp(
        lambda fv, xx: _xla_forward({**rest, **fv}, xx, meta),
        {k: dev[k] for k in fkeys}, x)
    dfv, dx = pull(g)
    ddev = {
        k: (dfv[k].astype(v.dtype) if k in fkeys
            else np.zeros(v.shape, dtype=jax.dtypes.float0))
        for k, v in dev.items()
    }
    return (ddev, dx)


_panel2_vjp.defvjp(_panel2_vjp_fwd, _panel2_vjp_bwd)


def panel2_apply(plan: Panel2Plan, dev, x, *, interpret: bool = False):
    """Apply the v2 panel plan: y = A @ x.  Differentiable in x and
    values."""
    return _panel2_vjp(dev, x, _meta(plan), interpret)
