"""Batched multi-operand products: P independent SpMMs in ONE launch.

A single product's piped wall on the patch mono-kernel is MXU time plus
per-kernel x/y VMEM staging that cannot overlap across serialized kernel
launches (measured config4: 17.4 us/product = 52% of roofline;
benchmarks/proto_r5_spmm2.py, proto_r5_spmm3.py, proto_r5_async.py).
Running P same-structure products as one pallas launch with grid
(P, steps) lets the Mosaic block pipeline prefetch product p+1's x and
value slabs during product p's compute: measured 10.1 us/product = 90%
of the HBM roofline at precision="highest"
(benchmarks/proto_r5_batched.py).

The reference has no batched-product concept (independent products go
through separate LinearMaps calls); this is a TPU-native addition for
workloads with many right-hand-side *operators* (e.g. frequency sweeps
over BEM systems with one near-field structure).

Eligibility: every operator carries the same index STRUCTURE (equal patch
chunk/row tables -- value contents may differ), f32, plain forward
products.  Ineligible inputs fall back to a per-operator loop with
identical semantics.  (Batching the minimal-op XLA SpMV chain was
measured NOT to pay in either formulation: 5.9 us/product with a batched
gather, 6.2 with per-product gathers + batched einsums, vs 5.3 serial --
benchmarks/proto_r5_batched.py, proto_r5_batched2.py; general-format
SpMV batching stays a loop.  Panel-engine SpMV does profit -- see
batched_mv.)
"""

from __future__ import annotations

import functools
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.patch import CC, PatchPlan
from .patch_engine import R_SLICE, _rows_c, _rows_r, _slot_dot

__all__ = ["batched_mm", "batched_mv"]


def _kern_batched(cc_ref, rs_ref, x_ref, v_ref, y_ref, *, G, KC_, MP, prec):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for g in range(G):
        b = s * G + g
        parts = [x_ref[0, pl.ds(cc_ref[b, j] * CC, CC), :]
                 for j in range(KC_)]
        xg = jnp.concatenate(parts, axis=0)
        yp = _slot_dot(v_ref[0, g], xg, prec)
        y_ref[0, pl.ds(rs_ref[b], MP), :] += yp


def _batched_raw(meta, vals_stack, cc, rs, Xp, interpret):
    P, G, MP, KP, R, xrows, yrows, steps, prec = meta
    KC_ = KP // CC
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, steps),
        in_specs=[
            pl.BlockSpec((1, xrows, R), lambda p, s, c, r: (p, 0, 0)),
            pl.BlockSpec((1, G, MP, KP), lambda p, s, c, r: (p, s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, yrows, R), lambda p, s, c, r: (p, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kern_batched, G=G, KC_=KC_, MP=MP, prec=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, yrows, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals_stack.size * R,
            bytes_accessed=vals_stack.size * 4
            + P * (xrows + yrows) * R * 4,
            transcendentals=0),
        interpret=interpret,
    )(cc, rs, Xp, vals_stack)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _batched_vjp(meta, interpret, vals_stack, cc, rs, Xp):
    return _batched_raw(meta, vals_stack, cc, rs, Xp, interpret)


def _batched_fwd(meta, interpret, vals_stack, cc, rs, Xp):
    return _batched_raw(meta, vals_stack, cc, rs, Xp, interpret), (
        vals_stack, cc, rs, Xp)


def _batched_bwd(meta, interpret, res, g):
    # exact cotangents through the same chunk tables (mirror of
    # patch_engine._spmm_vjp_bwd with a leading P dim)
    from .patch_engine import _gather_chunks, _window_chunks
    from ..core.patch import CR

    P, G, MP, KP, R, xrows, yrows, steps, prec = meta
    vals, cc, rs, Xp = res
    nb = vals.shape[1]
    KC_, MC_ = KP // CC, MP // CR
    rch = _window_chunks(rs, MP)
    dvals = []
    dX = []
    for p in range(P):
        gw = _gather_chunks(g[p], rch, CR)
        xg = _gather_chunks(Xp[p], cc, CC)
        dvals.append(jnp.einsum("bmr,bkr->bmk", gw, xg,
                                precision=jax.lax.Precision.HIGHEST))
        dxp = jnp.einsum("bmk,bmr->bkr", vals[p], gw,
                         precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.zeros((xrows // CC, CC, R), jnp.float32)
        d2 = d2.at[cc].add(dxp.reshape(nb, KC_, CC, R))
        dX.append(d2.reshape(xrows, R))
    z = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (jnp.stack(dvals).astype(vals.dtype), z(cc), z(rs),
            jnp.stack(dX).astype(Xp.dtype))


_batched_vjp.defvjp(_batched_fwd, _batched_bwd)


# stacked-values cache: keyed by operator identities; entries hold strong
# refs so ids cannot be reused while alive (same pattern as
# xla_spmv._MULTI_HOST_CACHE).  NEVER populated from inside a jit trace:
# jnp values created while tracing are trace-local tracers, and caching
# one leaks it into later traces (the _multi_host_tables lesson).
_STACK_CACHE: "OrderedDict" = OrderedDict()
_STACK_CACHE_MAX = 8


def _trace_clean() -> bool:
    try:
        return jax.core.trace_state_clean()
    except AttributeError:  # pragma: no cover - older jax
        return False


def _cache_put(key, ops, result):
    if not _trace_clean():
        return
    _STACK_CACHE[key] = (tuple(ops), result)
    while len(_STACK_CACHE) > _STACK_CACHE_MAX:
        _STACK_CACHE.popitem(last=False)


def _same_structure(plans) -> bool:
    b0 = plans[0].buckets[0]
    for p in plans[1:]:
        b = p.buckets[0]
        if (b.MP, b.KP, b.G, b.nb) != (b0.MP, b0.KP, b0.G, b0.nb):
            return False
        if not (np.array_equal(b.col_chunk, b0.col_chunk)
                and np.array_equal(b.row_chunk, b0.row_chunk)
                and np.array_equal(b.row_start, b0.row_start)
                and np.array_equal(b.mirror_kc, b0.mirror_kc)):
            return False
    return True


def _stacked_entry(ops):
    key = tuple(id(op) for op in ops)
    hit = _STACK_CACHE.get(key)
    if hit is not None:
        _STACK_CACHE.move_to_end(key)
        return hit[1]
    entries = [op._patch_for() if not hasattr(op, "_dlayout")
               else None for op in ops]
    if any(e is None for e in entries):
        result = None
    else:
        plans = [e[0] for e in entries]
        if (any(p.symmetric for p in plans) or len(plans[0].buckets) != 1
                or not _same_structure(plans)):
            result = None
        else:
            vals_stack = jnp.stack([e[1][0][0] for e in entries])
            cc = entries[0][1][0][4]
            rs = entries[0][1][0][5]
            result = (plans[0], vals_stack, cc, rs)
    _cache_put(key, ops, result)
    return result


def _same_panel_structure(plans) -> bool:
    p0 = plans[0]
    for p in plans[1:]:
        if (p.S, p.TS, p.CW, p.RW, p.n8p, p.NC32, p.mirror,
                tuple(p.grids_used)) != (
                p0.S, p0.TS, p0.CW, p0.RW, p0.n8p, p0.NC32, p0.mirror,
                tuple(p0.grids_used)):
            return False
        if not (np.array_equal(p.segid, p0.segid)
                and np.array_equal(p.rid8, p0.rid8)
                and np.array_equal(p.cid8, p0.cid8)
                and np.array_equal(p.b8, p0.b8)):
            return False
    return True


# Per-product value-stream cap for the batched panel route: at configS
# scale (57.8 MB/product) the grid-(P, S) kernel degrades ~2.7x instead
# of helping (measured 255-263 us/product vs 93 serial -- large slabs +
# the P dimension defeat the block pipeline); config2/3-scale plans
# (~11 MB) are where the launch/gather amortization wins.
_BATCHED_PANEL_TILE_CAP = 24 << 20


def _stacked_panel_entry(ops):
    key = ("mv",) + tuple(id(op) for op in ops)
    hit = _STACK_CACHE.get(key)
    if hit is not None:
        _STACK_CACHE.move_to_end(key)
        return hit[1]
    entries = []
    for op in ops:
        fn = getattr(op, "_panel_for", None)
        entries.append(None if fn is None else fn(False))
    if any(e is None for e in entries):
        result = None
    else:
        plans = [e[0] for e in entries]
        if (plans[0].tile_bytes > _BATCHED_PANEL_TILE_CAP
                or not _same_panel_structure(plans)):
            result = None
        else:
            plan = plans[0]
            vals_b = jnp.stack([e[1][0] for e in entries])
            d0 = entries[0][1]
            shared = (d0[1], d0[2], d0[3], d0[4], d0[5])
            result = (plan, shared, vals_b)
    _cache_put(key, ops, result)
    return result


def batched_mv(ops, xs):
    """``[ops[p] @ xs[p] for p]`` in one panel-kernel launch where possible.

    ``ops``: same-structure f32 operators (equal panel index structure;
    values may differ -- e.g. one BEM near-field structure across
    frequencies).  ``xs``: [P, n] array or list of [n].  Returns [P, m].
    One x-gather chain and one grid-(P, S) launch serve all P products
    (measured config2 symmetric 25.6 -> 22.6 us/product, config3 VBCRS
    20.5 -> 19.4; benchmarks/proto_r5_batchpanel.py).  Falls back to a
    per-operator loop when ineligible.  Differentiable in ``xs`` and
    each operator's panel values.

    (The general-format XLA chain was measured NOT to profit from
    batching -- config1 5.9 vs 5.3 us/product -- so operators routed to
    the bucket engines just loop.)
    """
    ops = list(ops)
    if isinstance(xs, (list, tuple)):
        xs = jnp.stack([jnp.asarray(x) for x in xs])
    P = len(ops)
    if xs.shape[0] != P:
        raise ValueError(
            f"batched_mv: {P} operators but xs has leading dim "
            f"{xs.shape[0]}")
    if xs.ndim != 2:
        raise ValueError("batched_mv expects xs of shape [P, n]")
    interpret = any(getattr(op, "_backend", "") == "pallas-interpret"
                    for op in ops)
    eligible = (
        P >= 2
        and xs.dtype == jnp.float32
        and all(type(op) is type(ops[0]) for op in ops)
        and all(jnp.dtype(op.dtype) == jnp.float32 for op in ops)
        and all(getattr(op, "_backend", "xla") != "xla" for op in ops)
        and (interpret or jax.default_backend() == "tpu")
    )
    entry = _stacked_panel_entry(ops) if eligible else None
    if entry is None:
        return jnp.stack([op @ xs[p] for p, op in enumerate(ops)])
    plan, shared, vals_b = entry
    from .pallas.panel_spmv import panel_apply_batched

    return panel_apply_batched(plan, shared, vals_b, xs,
                               interpret=interpret)


def batched_mm(ops, Xs, *, precision=None):
    """``[ops[p] @ Xs[p] for p]`` in one kernel launch where possible.

    ``ops``: same-structure f32 operators (equal index tables; values may
    differ).  ``Xs``: [P, n, r] array or a list of [n, r].  Returns
    [P, m, r].  Falls back to a per-operator loop when the batched kernel
    is ineligible (different structures, symmetric operands, non-f32,
    non-TPU backend without interpret).  Differentiable in ``Xs`` and in
    each operator's bucket values.
    """
    ops = list(ops)
    if isinstance(Xs, (list, tuple)):
        Xs = jnp.stack([jnp.asarray(X) for X in Xs])
    P = len(ops)
    if Xs.shape[0] != P:
        raise ValueError(
            f"batched_mm: {P} operators but Xs has leading dim "
            f"{Xs.shape[0]}")
    if Xs.ndim != 3:
        raise ValueError("batched_mm expects Xs of shape [P, n, r]")
    interpret = any(getattr(op, "_backend", "") == "pallas-interpret"
                    for op in ops)
    eligible = (
        P >= 2
        and Xs.dtype == jnp.float32
        and all(type(op) is type(ops[0]) for op in ops)
        and all(jnp.dtype(op.dtype) == jnp.float32 for op in ops)
        and all(getattr(op, "_backend", "xla") != "xla" for op in ops)
        and (interpret or jax.default_backend() == "tpu")
    )
    entry = _stacked_entry(ops) if eligible else None
    if entry is None:
        return jnp.stack([op @ Xs[p] for p, op in enumerate(ops)])
    plan, vals_stack, cc, rs = entry
    prec = precision
    if prec is None:
        prec = getattr(ops[0], "_precision", "highest")
    n, r = Xs.shape[1], Xs.shape[2]
    if r > R_SLICE:
        parts = [
            batched_mm(ops, Xs[:, :, lo:lo + R_SLICE], precision=precision)
            for lo in range(0, r, R_SLICE)
        ]
        return jnp.concatenate(parts, axis=2)
    b = plan.buckets[0]
    xrows, yrows = _rows_c(plan), _rows_r(plan)
    meta = (P, b.G, b.MP, b.KP, r, xrows, yrows, b.nb // b.G, prec)
    Xp = jnp.pad(Xs, ((0, 0), (0, xrows - n), (0, 0)))
    y = _batched_vjp(meta, interpret, vals_stack, cc, rs, Xp)
    return y[:, :plan.nrows].astype(Xs.dtype)
