"""Patch engine: compute paths for the merged-patch layout (core/patch.py).

Three paths over the same storage:

- ``patch_spmv``  (r == 1, any backend): one-hot chunk gather -> batched
  contraction -> one-hot chunk scatter, all XLA.  The one-hot matmuls are
  exact (0/1 bf16 against f32 at HIGHEST) and replace both the TPU-hostile
  row gather and the scatter-add (measured 578 GB/s on a config2-shaped
  population vs 509 GB/s native chunk gathers, benchmarks/archive/proto_r3_oh.py).
- ``patch_spmm``  (r > 1, TPU): single-launch-per-bucket Pallas mono-kernel;
  x and y stay VMEM-resident, per-slot column chunks are fetched with
  dynamic sublane slices driven by scalar-prefetched tables, one MXU dot per
  slot (measured 75% of HBM roofline / 24.7 TFLOP/s where the bucketed
  einsum path reached 30%, benchmarks/archive/proto_r3_oh.py).
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
           "patch_spmv_kernel", "patch_kernel_ok", "patch_spmm",
           "patch_spmm_xla"]

HI = jax.lax.Precision.HIGHEST


def _slot_dot(a, b, prec):
    """Per-slot MXU dot at the operator's precision tier.

    'highest' -> Mosaic HIGHEST (6 bf16 passes, ~1e-7);
    'high'    -> explicit split-bf16 3-pass (Mosaic cannot lower HIGH;
                 same decomposition as fused_spmm._dot3, ~1e-6);
    None      -> single bf16 pass (~1e-3), the MXU-rate tier.
    The one-hot gather/scatter dots stay HIGHEST everywhere: 0/1 one-hots
    against f32 are exact there and they are not the FLOPs.
    """
    if prec == "highest":
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=HI)
    if prec == "high":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(a.dtype)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(b.dtype)).astype(jnp.bfloat16)

        def d(u, v):
            return jnp.dot(u, v, preferred_element_type=jnp.float32,
                           precision=None)

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=None)


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


def _x32_of(plan, x):
    """x reshaped onto the column-chunk grid (gather side)."""
    return _pad_to(x, (plan.NC + 1) * CC).reshape(plan.NC + 1, CC)


def _x8_of(plan, x):
    """x reshaped onto the row-chunk grid (row-window side).

    Only valid on branches that read x through row windows (transpose or
    symmetric products); a rectangular operand's x can exceed the row
    buffer, so callers must build this lazily on those branches only
    (ADVICE r3: a 16x1024 forward SpMV used to crash here)."""
    return _pad_to(x, (plan.NR + 1) * CR).reshape(plan.NR + 1, CR)


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
    n_out = plan.nrows if (not transpose or plan.symmetric) else plan.ncols
    # lazy per-branch reshapes: a rectangular operand's x fits only the
    # buffer its branch actually gathers from (ADVICE r3 medium)
    x32 = _x32_of(plan, x) if (not transpose or plan.symmetric) else None
    x8 = _x8_of(plan, x) if (transpose or plan.symmetric) else None
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
# re-streams them at ~1.35x, benchmarks/archive/proto_r3_stage.py), so the kernel is
# what realizes the one-read promise.  The kernel does ONLY the per-slot
# contractions (VPU lane/sublane reductions over the streamed canvases) and
# writes tiny per-slot vectors [nb, MP] / [nb, KP]; every gather/scatter
# stays outside as an exact one-hot matmul.  No dynamic indexing at all, so
# the only Mosaic shape constraint is G % 8 == 0 (enforced by the plan).
# ---------------------------------------------------------------------------


def _kern1_f(xg_ref, v_ref, yf_ref, *, G):
    for g in range(G):
        V = v_ref[g]                                             # [MP, KP]
        yf_ref[g, :] = jnp.sum(V * xg_ref[g, :][None, :], axis=1)


def _kern1_t(xr_ref, v_ref, yt_ref, *, G):
    for g in range(G):
        V = v_ref[g]
        yt_ref[g, :] = jnp.sum(V * xr_ref[g, :][:, None], axis=0)


def _kern1_m(xg_ref, xr_ref, v_ref, yf_ref, yt_ref, *, G):
    for g in range(G):
        V = v_ref[g]                                             # one read
        yf_ref[g, :] = jnp.sum(V * xg_ref[g, :][None, :], axis=1)
        yt_ref[g, :] = jnp.sum(V * xr_ref[g, :][:, None], axis=0)


def _spmv_kernel_raw(meta, vals, xg, xr, interpret):
    """Per-slot contractions; meta = (mode, G, MP, KP).

    mode 'f': yf[b,m] = sum_k V[b,m,k] xg[b,k]      (forward)
    mode 't': yt[b,k] = sum_m V[b,m,k] xr[b,m]      (transposed)
    mode 'm': both, from one read of V               (symmetric fused)
    """
    mode, G, MP, KP = meta
    nb = vals.shape[0]
    steps = nb // G
    sl = lambda s: (s, 0)
    g_spec = pl.BlockSpec((G, KP), sl)
    r_spec = pl.BlockSpec((G, MP), sl)
    v_spec = pl.BlockSpec((G, MP, KP), lambda s: (s, 0, 0))
    yf_shape = jax.ShapeDtypeStruct((nb, MP), jnp.float32)
    yt_shape = jax.ShapeDtypeStruct((nb, KP), jnp.float32)
    flops = 2 * vals.size * (2 if mode == "m" else 1)
    cp = dict(
        grid=(steps,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=vals.size * 4, transcendentals=0),
        interpret=interpret,
    )
    if mode == "f":
        return pl.pallas_call(
            functools.partial(_kern1_f, G=G), in_specs=[g_spec, v_spec],
            out_specs=r_spec, out_shape=yf_shape, **cp)(xg, vals)
    if mode == "t":
        return pl.pallas_call(
            functools.partial(_kern1_t, G=G), in_specs=[r_spec, v_spec],
            out_specs=g_spec, out_shape=yt_shape, **cp)(xr, vals)
    return pl.pallas_call(
        functools.partial(_kern1_m, G=G),
        in_specs=[g_spec, r_spec, v_spec],
        out_specs=[r_spec, g_spec],
        out_shape=[yf_shape, yt_shape], **cp)(xg, xr, vals)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmv1_vjp(meta, interpret, vals, xg, xr):
    return _spmv_kernel_raw(meta, vals, xg, xr, interpret)


def _spmv1_fwd(meta, interpret, vals, xg, xr):
    return _spmv_kernel_raw(meta, vals, xg, xr, interpret), (vals, xg, xr)


def _spmv1_bwd(meta, interpret, res, g):
    mode = meta[0]
    vals, xg, xr = res
    gf = g[0] if mode == "m" else (g if mode == "f" else None)
    gt = g[1] if mode == "m" else (g if mode == "t" else None)
    dvals = jnp.zeros_like(vals)
    dxg = jnp.zeros_like(xg)
    dxr = jnp.zeros_like(xr)
    if gf is not None:
        dvals = dvals + gf[:, :, None] * xg[:, None, :]
        dxg = dxg + jnp.einsum("bmk,bm->bk", vals, gf, precision=HI)
    if gt is not None:
        dvals = dvals + xr[:, :, None] * gt[:, None, :]
        dxr = dxr + jnp.einsum("bmk,bk->bm", vals, gt, precision=HI)
    return (dvals.astype(vals.dtype), dxg.astype(xg.dtype),
            dxr.astype(xr.dtype))


_spmv1_vjp.defvjp(_spmv1_fwd, _spmv1_bwd)


def patch_kernel_ok(plan: PatchPlan) -> bool:
    """The r=1 kernel blocks per-slot arrays as (G, MP)/(G, KP): Mosaic
    needs G % 8 == 0 (the plan enforces it within a VMEM budget)."""
    return all(b.G % 8 == 0 for b in plan.buckets)


def patch_spmv_kernel(plan: PatchPlan, dev, x, *, transpose: bool = False,
                      interpret: bool = False):
    """y = A @ x (A^T @ x when ``transpose``) via the one-read kernel.

    Same math as :func:`patch_spmv` with the streaming contraction(s) fused
    into a single pallas_call; the one-hot gathers/scatters run as XLA
    matmuls on KB-sized operands.  Symmetric plans emit forward + mirrored
    contributions from one read of the value stream (the reference reads
    each stored off-diagonal twice, symmetricblockmatrix.jl:394-418);
    their transpose is handled by the caller via a transposed-diagonal plan.
    """
    (vals, gOH, sOH, flag, _cc, _rs, _mk) = dev[0]
    nb, MP, KP = vals.shape
    b = plan.buckets[0]
    zg = jnp.zeros((nb, KP), jnp.float32)
    zr = jnp.zeros((nb, MP), jnp.float32)

    def gather_g():
        # lazy: only branches that gather chunk columns reshape onto the
        # column grid (rectangular transpose x may not fit it; ADVICE r3)
        return jnp.dot(gOH, _x32_of(plan, x),
                       preferred_element_type=jnp.float32,
                       precision=HI).reshape(nb, KP)

    def gather_r():
        return jnp.dot(sOH, _x8_of(plan, x),
                       preferred_element_type=jnp.float32,
                       precision=HI).reshape(nb, MP)

    def scat_f(yf):
        u = jnp.dot(sOH.T, yf.reshape(nb * (MP // CR), CR),
                    preferred_element_type=jnp.float32, precision=HI)
        return u.reshape(-1)

    def scat_t(yt):
        u = jnp.dot(gOH.T, yt.reshape(nb * (KP // CC), CC),
                    preferred_element_type=jnp.float32, precision=HI)
        return u.reshape(-1)

    if plan.symmetric:
        meta = ("m", b.G, MP, KP)
        yf, yt = _spmv1_vjp(meta, interpret, vals, gather_g(), gather_r())
        ytm = yt * jnp.repeat(flag, CC, axis=1)
        y = (scat_f(yf)[:plan.nrows] + scat_t(ytm)[:plan.nrows])
        return y.astype(x.dtype)
    if transpose:
        meta = ("t", b.G, MP, KP)
        yt = _spmv1_vjp(meta, interpret, vals, zg, gather_r())
        return scat_t(yt)[:plan.ncols].astype(x.dtype)
    meta = ("f", b.G, MP, KP)
    yf = _spmv1_vjp(meta, interpret, vals, gather_g(), zr)
    return scat_f(yf)[:plan.nrows].astype(x.dtype)


# ---------------------------------------------------------------------------
# r > 1: Pallas mono-kernel (x, y VMEM-resident; one MXU dot per slot)
# ---------------------------------------------------------------------------


def _kern_fwd(cc_ref, rs_ref, mk_ref, x_ref, v_ref, y_ref, *, G, KC_, MP,
              prec):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for g in range(G):
        b = s * G + g
        parts = [x_ref[pl.ds(cc_ref[b, j] * CC, CC), :] for j in range(KC_)]
        xg = jnp.concatenate(parts, axis=0)
        yp = _slot_dot(v_ref[g], xg, prec)
        y_ref[pl.ds(rs_ref[b], MP), :] += yp


def _kern_mir(cc_ref, rs_ref, mk_ref, x_ref, v_ref, y_ref, *, G, KC_, MP,
              prec):
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
        yp = _slot_dot(V, xg, prec)
        y_ref[pl.ds(rs_ref[b], MP), :] += yp
        xr = x_ref[pl.ds(rs_ref[b], MP), :]
        yt = _slot_dot(V.T, xr, prec)
        for j in range(KC_):
            @pl.when(j < mk_ref[b])
            def _(j=j):
                y_ref[pl.ds(cc_ref[b, j] * CC, CC), :] += (
                    yt[j * CC:(j + 1) * CC, :])


def _kern_tr(cc_ref, rs_ref, mk_ref, x_ref, v_ref, y_ref, *, G, KC_, MP,
             prec):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for g in range(G):
        b = s * G + g
        xr = x_ref[pl.ds(rs_ref[b], MP), :]
        yt = _slot_dot(v_ref[g].T, xr, prec)
        for j in range(KC_):
            y_ref[pl.ds(cc_ref[b, j] * CC, CC), :] += yt[j * CC:(j + 1) * CC, :]


_KERNELS = {"fwd": _kern_fwd, "mir": _kern_mir, "tr": _kern_tr}


def _bucket_spmm_raw(meta, vals, cc, rs, mk, x2, interpret):
    """meta = (mode, G, MP, KP, R, xrows, yrows, prec)."""
    mode, G, MP, KP, R, xrows, yrows, prec = meta
    nb = vals.shape[0]
    KC_ = KP // CC
    steps = nb // G
    kern = functools.partial(_KERNELS[mode], G=G, KC_=KC_, MP=MP, prec=prec)
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
    mode, G, MP, KP, R, xrows, yrows, _prec = meta
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


R_SLICE = 256  # RHS columns per mono-kernel launch (x+y panels stay in VMEM)


def patch_spmm(plan: PatchPlan, dev, X, *, transpose: bool = False,
               interpret: bool = False, precision: str | None = "highest"):
    """Y = A @ X (A^T @ X when ``transpose``); X: [n, r] f32.

    ``precision`` selects the per-slot MXU dot tier (see _slot_dot);
    the scatter/gather machinery stays exact at every tier."""
    R = X.shape[1]
    if R > R_SLICE:
        parts = [
            patch_spmm(plan, dev, X[:, lo:lo + R_SLICE], transpose=transpose,
                       interpret=interpret, precision=precision)
            for lo in range(0, R, R_SLICE)
        ]
        return jnp.concatenate(parts, axis=1)
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
        meta = (mode, b.G, b.MP, b.KP, R, xrows, yrows, precision)
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
                backend: str = "auto", precision: str | None = "highest"):
    """Entry point: route by rank/backend.  x: [n] or [n, r] f32.

    ``precision`` reaches the SpMM mono-kernel's per-slot dots; the r=1
    paths are HBM-bound and always run their (exact) HIGHEST formulation.
    """
    interpret = backend == "pallas-interpret"
    on_kernel_path = interpret or (backend != "xla"
                                   and jax.default_backend() == "tpu")
    if x.ndim == 1:
        if on_kernel_path and patch_kernel_ok(plan):
            return patch_spmv_kernel(plan, dev, x, transpose=transpose,
                                     interpret=interpret)
        return patch_spmv(plan, dev, x, transpose=transpose)
    if on_kernel_path:
        return patch_spmm(plan, dev, x, transpose=transpose,
                          interpret=interpret, precision=precision)
    return patch_spmm_xla(plan, dev, x, transpose=transpose)
