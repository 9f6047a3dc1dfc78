"""Patch engine: compute paths for the merged-patch layout (core/patch.py).

Three paths over the same storage:

- ``patch_spmv``  (r == 1, any backend): one-hot chunk gather -> batched
  contraction -> one-hot chunk scatter, all XLA.  The one-hot matmuls are
  exact (0/1 bf16 against f32 at HIGHEST) and replace both the TPU-hostile
  row gather and the scatter-add (measured 578 GB/s on a config2-shaped
  population vs 509 GB/s native chunk gathers, benchmarks/proto_r3_oh.py).
- ``patch_spmm``  (r > 1, TPU): single-launch-per-bucket Pallas mono-kernel;
  x and y stay VMEM-resident, per-slot column chunks are fetched with
  dynamic sublane slices driven by scalar-prefetched tables, one MXU dot per
  slot (measured 75% of HBM roofline / 24.7 TFLOP/s where the bucketed
  einsum path reached 30%, benchmarks/proto_r3_oh.py).
- ``patch_spmm_xla``: reference-semantics fallback for r > 1 off-TPU.

The transpose product swaps the gather/scatter roles over the same storage
(zero data movement -- the reference's lazy adjoint/transpose,
/root/reference/src/blockmatrix.jl:154-206).  The symmetric fused pass emits
the mirrored contribution of every stored off-diagonal from the same values
read (one read, two contributions -- the reference reads each stored block
twice, symmetricblockmatrix.jl:394-418).

All paths are linear in (vals, x); the Pallas kernel carries a custom VJP
with exact cotangents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.patch import CC, CR, PatchPlan, one_hot_arrays

__all__ = ["patch_device_arrays", "patch_apply", "patch_spmv",
           "patch_spmv_kernel", "patch_spmm", "patch_spmm_xla"]

HI = jax.lax.Precision.HIGHEST


def patch_device_arrays(plan: PatchPlan):
    """Device leaves per bucket:
    (vals, gOH bf16, sOH bf16, flag f32, col_chunk, row_start, mirror_kc)."""
    out = []
    for b, (g, s, flag) in zip(plan.buckets, one_hot_arrays(plan)):
        out.append((
            jnp.asarray(b.vals),
            jnp.asarray(g, dtype=jnp.bfloat16),
            jnp.asarray(s, dtype=jnp.bfloat16),
            jnp.asarray(flag),
            jnp.asarray(b.col_chunk),
            jnp.asarray(b.row_start),
            jnp.asarray(b.mirror_kc),
        ))
    return tuple(out)


def _pad_to(x, rows):
    pad = rows - x.shape[0]
    if pad <= 0:
        return x
    widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, widths)


def _rows_r(plan: PatchPlan) -> int:
    """Row-side buffer length: covers every slot window rs + MP."""
    return (plan.NR + plan.MC_max) * CR


def _rows_c(plan: PatchPlan) -> int:
    return (plan.NC + 1) * CC


# ---------------------------------------------------------------------------
# r == 1: one-hot XLA engine
# ---------------------------------------------------------------------------


def patch_spmv(plan: PatchPlan, dev, x, *, transpose: bool = False):
    """y = A @ x (A^T @ x when ``transpose``); x: [n] f32."""
    NC, NR = plan.NC, plan.NR
    n_out = plan.nrows if (not transpose or plan.symmetric) else plan.ncols
    x32 = _pad_to(x, (NC + 1) * CC).reshape(NC + 1, CC)
    x8 = _pad_to(x, (NR + 1) * CR).reshape(NR + 1, CR)
    y = jnp.zeros((n_out,), jnp.float32)

    for (vals, gOH, sOH, flag, _cc, _rs, _mk) in dev:
        nb, MP, KP = vals.shape
        if not transpose or plan.symmetric:
            xg = jnp.dot(gOH, x32, preferred_element_type=jnp.float32,
                         precision=HI).reshape(nb, KP)
            yp = jnp.einsum("bmk,bk->bm", vals, xg,
                            preferred_element_type=jnp.float32, precision=HI)
            upd = jnp.dot(sOH.T, yp.reshape(nb * (MP // CR), CR),
                          preferred_element_type=jnp.float32, precision=HI)
            y = y + upd.reshape(-1)[:n_out]
        if (transpose and not plan.symmetric) or plan.symmetric:
            # row-window gather -> transposed contraction -> column scatter
            xr = jnp.dot(sOH, x8, preferred_element_type=jnp.float32,
                         precision=HI).reshape(nb, MP)
            yt = jnp.einsum("bmk,bm->bk", vals, xr,
                            preferred_element_type=jnp.float32, precision=HI)
            if plan.symmetric:
                yt = yt * jnp.repeat(flag, CC, axis=1)
            updT = jnp.dot(gOH.T, yt.reshape(nb * (KP // CC), CC),
                           preferred_element_type=jnp.float32, precision=HI)
            y = y + updT.reshape(-1)[:n_out]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# r == 1 Pallas mono-kernel: ONE read of the value stream serves both the
# forward and (for symmetric plans) the mirrored contribution.  XLA cannot
# be made to fuse the two passes over vals (measured: the fused XLA graph
# re-streams them at ~1.35x, benchmarks/proto_r3_stage.py), so the kernel is
# what realizes the one-read promise.  Gathers stay outside as exact one-hot
# matmuls; both scatters happen in-kernel with sublane-dynamic slices (the
# only dynamic-offset direction Mosaic supports at CR/CC granularity).
# ---------------------------------------------------------------------------


def _kern1_fwd(cc_ref, rs_ref, mk_ref, xg_ref, v_ref, y_ref, *, G, MP):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for g in range(G):
        b = s * G + g
        V = v_ref[g]                                   # [MP, KP]
        xg = xg_ref[g]                                 # [KP] lanes
        yp = jnp.sum(V * xg[None, :], axis=1, keepdims=True)   # [MP, 1]
        y_ref[pl.ds(rs_ref[b], MP), :] += yp


def _kern1_mir(cc_ref, rs_ref, mk_ref, xg_ref, xrT_ref, v_ref, y_ref,
               ym_ref, *, G, MP, KC_):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)
        ym_ref[:] = jnp.zeros_like(ym_ref)

    for g in range(G):
        b = s * G + g
        V = v_ref[g]                                   # [MP, KP]
        xg = xg_ref[g]                                 # [KP] lanes
        yp = jnp.sum(V * xg[None, :], axis=1, keepdims=True)   # [MP, 1]
        y_ref[pl.ds(rs_ref[b], MP), :] += yp
        xr = xrT_ref[:, g:g + 1]                       # [MP, 1] static lane
        yt = jnp.sum(V * xr, axis=0, keepdims=True)    # [1, KP]
        for j in range(KC_):
            @pl.when(j < mk_ref[b])
            def _(j=j):
                ym_ref[pl.ds(cc_ref[b, j], 1), :] += (
                    yt[:, j * CC:(j + 1) * CC])


def _spmv_kernel_raw(meta, vals, cc, rs, mk, xg, xrT, interpret):
    """meta = (mirror: bool, G, MP, KP, yrows, NCp)."""
    mirror, G, MP, KP, yrows, NCp = meta
    nb = vals.shape[0]
    KC_ = KP // CC
    steps = nb // G
    if mirror:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((G, KP), lambda s, c, r, m: (s, 0)),
                pl.BlockSpec((MP, G), lambda s, c, r, m: (0, s)),
                pl.BlockSpec((G, MP, KP), lambda s, c, r, m: (s, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((yrows, 1), lambda s, c, r, m: (0, 0)),
                pl.BlockSpec((NCp, CC), lambda s, c, r, m: (0, 0)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kern1_mir, G=G, MP=MP, KC_=KC_),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((yrows, 1), jnp.float32),
                jax.ShapeDtypeStruct((NCp, CC), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=4 * vals.size, bytes_accessed=vals.size * 4,
                transcendentals=0),
            interpret=interpret,
        )(cc, rs, mk, xg, xrT, vals)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((G, KP), lambda s, c, r, m: (s, 0)),
            pl.BlockSpec((G, MP, KP), lambda s, c, r, m: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((yrows, 1), lambda s, c, r, m: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kern1_fwd, G=G, MP=MP),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((yrows, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size, bytes_accessed=vals.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(cc, rs, mk, xg, vals)


def patch_spmv_kernel(plan: PatchPlan, dev, x, *, transpose: bool = False,
                      interpret: bool = False):
    """y = A @ x via the one-read Pallas kernel (TPU fast path, r == 1).

    The transpose of a plain operand reuses the forward kernel with the
    roles of the one-hot gathers/scatters swapped at the XLA level (gather
    rows via sOH, kernel runs on the TRANSPOSED canvas? no -- transpose
    products route to :func:`patch_spmv`, the XLA engine, which is exact
    and rarely hot; symmetric plans are transpose-invariant up to the
    diagonal and use their own transposed-diag plan).
    """
    assert not transpose, "kernel path is forward-only; use patch_spmv"
    NC, NR = plan.NC, plan.NR
    (vals, gOH, sOH, _flag, cc, rs, mk) = dev[0]
    nb, MP, KP = vals.shape
    b = plan.buckets[0]
    x32 = _pad_to(x, (NC + 1) * CC).reshape(NC + 1, CC)
    xg = jnp.dot(gOH, x32, preferred_element_type=jnp.float32,
                 precision=HI).reshape(nb, KP)
    yrows = _rows_r(plan)
    if plan.symmetric:
        x8 = _pad_to(x, (NR + 1) * CR).reshape(NR + 1, CR)
        xrT = jnp.dot(sOH, x8, preferred_element_type=jnp.float32,
                      precision=HI).reshape(nb, MP).T
        meta = (True, b.G, MP, KP, yrows, NC + 1)
        yf, ym = _spmv1_vjp(meta, interpret, vals, cc, rs, mk, xg, xrT)
        y = (yf.reshape(-1)[:plan.nrows]
             + ym.reshape(-1)[:plan.nrows])
        return y.astype(x.dtype)
    meta = (False, b.G, MP, KP, yrows, NC + 1)
    yf = _spmv1_vjp(meta, interpret, vals, cc, rs, mk, xg,
                    jnp.zeros((MP, nb), jnp.float32))
    return yf.reshape(-1)[:plan.nrows].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmv1_vjp(meta, interpret, vals, cc, rs, mk, xg, xrT):
    return _spmv_kernel_raw(meta, vals, cc, rs, mk, xg, xrT, interpret)


def _spmv1_fwd(meta, interpret, vals, cc, rs, mk, xg, xrT):
    out = _spmv_kernel_raw(meta, vals, cc, rs, mk, xg, xrT, interpret)
    return out, (vals, cc, rs, mk, xg, xrT)


def _spmv1_bwd(meta, interpret, res, g):
    mirror, G, MP, KP, yrows, NCp = meta
    vals, cc, rs, mk, xg, xrT = res
    nb = vals.shape[0]
    KC_ = KP // CC
    if mirror:
        gf, gm = g
    else:
        gf, gm = g, None
    # cotangents via the XLA formulation (exact; the op is linear)
    rws = rs[:, None] + jnp.arange(MP)[None, :]
    gwin = gf[:, 0][rws]                               # [nb, MP]
    dvals = gwin[:, :, None] * xg[:, None, :]
    dxg = jnp.einsum("bmk,bm->bk", vals, gwin, precision=HI)
    dxrT = jnp.zeros_like(xrT)
    if mirror:
        fl = (jnp.arange(KC_)[None, :] < mk[:, None]).astype(jnp.float32)
        gm2 = gm.reshape(-1, CC)                        # [NCp, CC]
        gch = gm2[cc]                                   # [nb, KC, CC]
        gch = (gch * fl[..., None]).reshape(nb, KP)
        dvals = dvals + xrT.T[:, :, None] * gch[:, None, :]
        dxrT = jnp.einsum("bmk,bk->bm", vals, gch, precision=HI).T
    z = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dvals.astype(vals.dtype), z(cc), z(rs), z(mk),
            dxg.astype(xg.dtype), dxrT.astype(xrT.dtype))


_spmv1_vjp.defvjp(_spmv1_fwd, _spmv1_bwd)


# ---------------------------------------------------------------------------
# r > 1: Pallas mono-kernel (x, y VMEM-resident; one MXU dot per slot)
# ---------------------------------------------------------------------------


def _kern_fwd(cc_ref, rs_ref, mk_ref, x_ref, v_ref, y_ref, *, G, KC_, MP):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for g in range(G):
        b = s * G + g
        parts = [x_ref[pl.ds(cc_ref[b, j] * CC, CC), :] for j in range(KC_)]
        xg = jnp.concatenate(parts, axis=0)
        yp = jnp.dot(v_ref[g], xg, preferred_element_type=jnp.float32,
                     precision=HI)
        y_ref[pl.ds(rs_ref[b], MP), :] += yp


def _kern_mir(cc_ref, rs_ref, mk_ref, x_ref, v_ref, y_ref, *, G, KC_, MP):
    """Symmetric fused: forward + mirrored chunks, square operand; x_ref
    and y_ref share the unified row extent."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for g in range(G):
        b = s * G + g
        V = v_ref[g]
        parts = [x_ref[pl.ds(cc_ref[b, j] * CC, CC), :] for j in range(KC_)]
        xg = jnp.concatenate(parts, axis=0)
        yp = jnp.dot(V, xg, preferred_element_type=jnp.float32, precision=HI)
        y_ref[pl.ds(rs_ref[b], MP), :] += yp
        xr = x_ref[pl.ds(rs_ref[b], MP), :]
        yt = jnp.dot(V.T, xr, preferred_element_type=jnp.float32,
                     precision=HI)
        for j in range(KC_):
            @pl.when(j < mk_ref[b])
            def _(j=j):
                y_ref[pl.ds(cc_ref[b, j] * CC, CC), :] += (
                    yt[j * CC:(j + 1) * CC, :])


def _kern_tr(cc_ref, rs_ref, mk_ref, x_ref, v_ref, y_ref, *, G, KC_, MP):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for g in range(G):
        b = s * G + g
        xr = x_ref[pl.ds(rs_ref[b], MP), :]
        yt = jnp.dot(v_ref[g].T, xr, preferred_element_type=jnp.float32,
                     precision=HI)
        for j in range(KC_):
            y_ref[pl.ds(cc_ref[b, j] * CC, CC), :] += yt[j * CC:(j + 1) * CC, :]


_KERNELS = {"fwd": _kern_fwd, "mir": _kern_mir, "tr": _kern_tr}


def _bucket_spmm_raw(meta, vals, cc, rs, mk, x2, interpret):
    """meta = (mode, G, MP, KP, R, xrows, yrows)."""
    mode, G, MP, KP, R, xrows, yrows = meta
    nb = vals.shape[0]
    KC_ = KP // CC
    steps = nb // G
    kern = functools.partial(_KERNELS[mode], G=G, KC_=KC_, MP=MP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((xrows, R), lambda s, c, r, m: (0, 0)),
            pl.BlockSpec((G, MP, KP), lambda s, c, r, m: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((yrows, R), lambda s, c, r, m: (0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((yrows, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size * R * (2 if mode == "mir" else 1),
            bytes_accessed=vals.size * 4 + (xrows + yrows) * R * 4,
            transcendentals=0),
        interpret=interpret,
    )(cc, rs, mk, x2, vals)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_vjp(meta, interpret, vals, cc, rs, mk, x2):
    return _bucket_spmm_raw(meta, vals, cc, rs, mk, x2, interpret)


def _spmm_vjp_fwd(meta, interpret, vals, cc, rs, mk, x2):
    return _bucket_spmm_raw(meta, vals, cc, rs, mk, x2, interpret), (
        vals, cc, rs, mk, x2)


def _gather_chunks(mat, chunk_idx, C):
    """[rows, r] + [nb, e] chunk ids -> [nb, e*C, r] (rows % C == 0)."""
    rows, r = mat.shape
    m2 = mat.reshape(rows // C, C, r)
    nb, e = chunk_idx.shape
    return m2[chunk_idx].reshape(nb, e * C, r)


def _window_chunks(rs, MP):
    return rs[:, None] // CR + jnp.arange(MP // CR)[None, :]


def _spmm_vjp_bwd(meta, interpret, res, g):
    mode, G, MP, KP, R, xrows, yrows = meta
    vals, cc, rs, mk, x2 = res
    nb = vals.shape[0]
    KC_, MC_ = KP // CC, MP // CR
    rch = _window_chunks(rs, MP)
    dvals = jnp.zeros_like(vals)
    dx = jnp.zeros_like(x2)
    if mode in ("fwd", "mir"):
        gw = _gather_chunks(g, rch, CR)               # [nb, MP, R]
        xg = _gather_chunks(x2, cc, CC)               # [nb, KP, R]
        dvals = dvals + jnp.einsum("bmr,bkr->bmk", gw, xg, precision=HI)
        dxp = jnp.einsum("bmk,bmr->bkr", vals, gw, precision=HI)
        d2 = jnp.zeros((xrows // CC, CC, R), jnp.float32)
        d2 = d2.at[cc].add(dxp.reshape(nb, KC_, CC, R))
        dx = dx + d2.reshape(xrows, R)
    if mode in ("mir", "tr"):
        gc = _gather_chunks(g, cc, CC)                # [nb, KP, R]
        if mode == "mir":
            fl = (jnp.arange(KC_)[None, :] < mk[:, None]).astype(jnp.float32)
            gc = gc * jnp.repeat(fl, CC, axis=1)[..., None]
        xw = _gather_chunks(x2, rch, CR)              # [nb, MP, R]
        dvals = dvals + jnp.einsum("bmr,bkr->bmk", xw, gc, precision=HI)
        dxp = jnp.einsum("bmk,bkr->bmr", vals, gc, precision=HI)
        d2 = jnp.zeros((xrows // CR, CR, R), jnp.float32)
        d2 = d2.at[rch].add(dxp.reshape(nb, MC_, CR, R))
        dx = dx + d2.reshape(xrows, R)
    z = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dvals.astype(vals.dtype), z(cc), z(rs), z(mk),
            dx.astype(x2.dtype))


_spmm_vjp.defvjp(_spmm_vjp_fwd, _spmm_vjp_bwd)


def patch_spmm(plan: PatchPlan, dev, X, *, transpose: bool = False,
               interpret: bool = False):
    """Y = A @ X (A^T @ X when ``transpose``); X: [n, r] f32."""
    R = X.shape[1]
    rows_c, rows_r = _rows_c(plan), _rows_r(plan)
    if plan.symmetric:
        mode = "mir"
        u = max(rows_c, rows_r)
        rows_c = rows_r = u
        # mirror scatter targets column chunks: keep them CR- and CC-valid
        u = -(-u // (CC * CR)) * (CC * CR)
        rows_c = rows_r = u
    elif transpose:
        mode = "tr"
    else:
        mode = "fwd"
    xrows = rows_r if mode == "tr" else rows_c
    yrows = rows_c if mode == "tr" else rows_r
    if plan.symmetric:
        xrows = yrows = rows_c
    x2 = _pad_to(X, xrows)
    y = None
    for b, (vals, _g, _s, _f, cc, rs, mk) in zip(plan.buckets, dev):
        meta = (mode, b.G, b.MP, b.KP, R, xrows, yrows)
        part = _spmm_vjp(meta, interpret, vals, cc, rs, mk, x2)
        y = part if y is None else y + part
    n_out = plan.nrows if mode != "tr" else plan.ncols
    if y is None:
        return jnp.zeros((n_out, R), X.dtype)
    return y[:n_out].astype(X.dtype)


# ---------------------------------------------------------------------------
# r > 1 XLA fallback (CPU correctness / non-TPU backends)
# ---------------------------------------------------------------------------


def patch_spmm_xla(plan: PatchPlan, dev, X, *, transpose: bool = False):
    R = X.shape[1]
    rows_c, rows_r = _rows_c(plan), _rows_r(plan)
    u = -(-max(rows_c, rows_r) // (CC * CR)) * (CC * CR)
    x2 = _pad_to(X, u)
    n_out = plan.nrows if (not transpose or plan.symmetric) else plan.ncols
    y = jnp.zeros((u, R), jnp.float32)
    for b, (vals, _g, _s, flag, cc, rs, _mk) in zip(plan.buckets, dev):
        nb, MP, KP = vals.shape
        KC_, MC_ = KP // CC, MP // CR
        rch = _window_chunks(rs, MP)
        if not transpose or plan.symmetric:
            xg = _gather_chunks(x2, cc, CC)
            yp = jnp.einsum("bmk,bkr->bmr", vals, xg, precision=HI)
            y = y.reshape(-1, CR, R).at[rch].add(
                yp.reshape(nb, MC_, CR, R)).reshape(u, R)
        if (transpose and not plan.symmetric) or plan.symmetric:
            xr = _gather_chunks(x2, rch, CR)
            yt = jnp.einsum("bmk,bmr->bkr", vals, xr, precision=HI)
            if plan.symmetric:
                yt = yt * jnp.repeat(flag, CC, axis=1)[..., None]
            y = y.reshape(-1, CC, R).at[cc].add(
                yt.reshape(nb, KC_, CC, R)).reshape(u, R)
    return y[:n_out].astype(X.dtype)


def patch_apply(plan: PatchPlan, dev, x, *, transpose: bool = False,
                backend: str = "auto"):
    """Entry point: route by rank/backend.  x: [n] or [n, r] f32."""
    interpret = backend == "pallas-interpret"
    on_kernel_path = interpret or (backend != "xla"
                                   and jax.default_backend() == "tpu")
    if x.ndim == 1:
        if on_kernel_path and not transpose:
            return patch_spmv_kernel(plan, dev, x, interpret=interpret)
        return patch_spmv(plan, dev, x, transpose=transpose)
    if on_kernel_path:
        return patch_spmm(plan, dev, x, transpose=transpose,
                          interpret=interpret)
    return patch_spmm_xla(plan, dev, x, transpose=transpose)
