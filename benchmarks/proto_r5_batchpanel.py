"""Round-5 probe: batched panel SpMV -- P products, one launch, one gather.

The panel engine's per-product overheads are op-floor-bound: ~3 us of
pad/roll/reshape/gather ops on KBs of x data, plus kernel launch
(proto_r5_gather).  A grid-(P, S) batched kernel with the x-gather done
once for [P, n] amortizes both across P products.  Value streams stay
distinct per product (honest piped semantics).

Measures config3 (VBCRS, plain) and config2 (symmetric fused) at P=4.

Run on the TPU: python benchmarks/proto_r5_batchpanel.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               "..", ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from blocksparse_tpu.core.strip import CC, RC  # noqa: E402
from blocksparse_tpu.core.panel import NSEG, SEG  # noqa: E402
from blocksparse_tpu.ops.pallas.panel_spmv import (  # noqa: E402
    _dg0, _gather_xs, _onehots, panel_device_arrays)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9
P = 4


def kern_plain_b(b8_ref, xs_ref, vals_ref, rid_ref, cid_ref, y8_ref,
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


def kern_mirror_b(b8_ref, xs_ref, x8_ref, vals_ref, rid_ref, cid_ref,
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


def gather_batched(xb, segid, S, CW, NC32, ncols, grids):
    """[P, n] -> [P, S, CW, CC] with ONE op chain for all P products."""
    pad = NC32 * SEG - ncols
    xp = jnp.pad(xb, ((0, 0), (0, pad))) if pad else xb
    planes = [jnp.roll(xp, -g, axis=1).reshape(P, NC32, SEG) if g else
              xp.reshape(P, NC32, SEG) for g in grids]
    x32 = jnp.concatenate(planes + [jnp.zeros((P, 1, SEG), jnp.float32)],
                          axis=1)
    return x32[:, segid.reshape(-1)].reshape(P, S, CW, CC)


def run_case(name, ops, mirror):
    plan = ops[0]._panel_for(False)[0]
    devs = [panel_device_arrays(op._panel_for(False)[0]) for op in ops]
    for op in ops[1:]:
        p2 = op._panel_for(False)[0]
        assert np.array_equal(p2.segid, plan.segid)
        assert p2.mirror == plan.mirror
    assert plan.mirror == mirror
    vals_b = jnp.stack([d[0] for d in devs])
    rid8, cid8, segid, b8, omap = (jnp.asarray(plan.rid8),
                                   jnp.asarray(plan.cid8),
                                   plan.segid, jnp.asarray(plan.b8),
                                   devs[0][5])
    S, TS, CW, RW, n8p, NC32 = (plan.S, plan.TS, plan.CW, plan.RW,
                                plan.n8p, plan.NC32)
    nrows, ncols = plan.nrows, plan.ncols
    grids = plan.grids_used
    if mirror:
        logical = (ops[0]._dlayout.nnz + ops[0]._olayout.nnz) * 4
    else:
        logical = ops[0].layout.nnz * 4
    roof = (logical + 2 * nrows * 4) / BW

    params = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals_b.size * (2 if mirror else 1),
            bytes_accessed=vals_b.size * 4, transcendentals=0),
    )
    if mirror:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(P, S),
            in_specs=[
                pl.BlockSpec((1, 1, CW, CC), lambda p, s, b: (p, s, 0, 0)),
                pl.BlockSpec((1, n8p, RC), lambda p, s, b: (p, 0, 0)),
                pl.BlockSpec((1, TS, RC, CC), lambda p, s, b: (p, s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda p, s, b: (s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda p, s, b: (s, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, n8p, RC), lambda p, s, b: (p, 0, 0)),
                pl.BlockSpec((1, 1, CW, CC), lambda p, s, b: (p, s, 0, 0)),
            ],
        )
        call = pl.pallas_call(
            functools.partial(kern_mirror_b, RW=RW, CW=CW),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((P, n8p, RC), jnp.float32),
                       jax.ShapeDtypeStruct((P, S, CW, CC), jnp.float32)],
            **params)

        @jax.jit
        def batched(xb):
            xs = gather_batched(xb, segid, S, CW, NC32, ncols, grids)
            x8pad = n8p * RC - nrows
            x8 = (jnp.pad(xb, ((0, 0), (0, x8pad))) if x8pad else xb
                  ).reshape(P, n8p, RC)
            y8, ym = call(b8, xs, x8, vals_b, rid8, cid8)
            y = y8.reshape(P, -1)[:, :nrows]
            ym32 = ym.reshape(P, S * CW * NSEG, SEG)
            y32 = jnp.einsum("rc,prk->pck", omap.astype(jnp.float32),
                             ym32, precision=HI)
            NGN = y32.shape[1] // NC32
            for gi, g in enumerate(grids[:NGN]):
                plane = y32[:, gi * NC32:(gi + 1) * NC32].reshape(P, -1)
                if g:
                    plane = jnp.pad(plane, ((0, 0), (g, 0)))
                y = y + plane[:, :nrows]
            return y
    else:
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
        call = pl.pallas_call(
            functools.partial(kern_plain_b, RW=RW, CW=CW),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((P, n8p, RC), jnp.float32),
            **params)

        @jax.jit
        def batched(xb):
            xs = gather_batched(xb, segid, S, CW, NC32, ncols, grids)
            y8 = call(b8, xs, vals_b, rid8, cid8)
            return y8.reshape(P, -1)[:, :nrows]

    rng = np.random.default_rng(3)
    xb = jnp.asarray(rng.standard_normal((P, ncols)).astype(np.float32))
    out = np.asarray(batched(xb))
    for i, op in enumerate(ops):
        ref = np.asarray(op @ xb[i])
        err = np.max(np.abs(out[i] - ref)) / max(1.0, np.max(np.abs(ref)))
        assert err < 1e-4, (name, i, err)
    print(f"{name}: batched correctness ok", flush=True)
    t = chained_time_per_iter(lambda xc: batched(xc) * 1e-3, xb,
                              iters_lo=3, iters_hi=12, repeats=5,
                              reduce="stats")
    us = t["median"] / P
    print(f"  [{name} batched P={P}] {us*1e6:.1f} us/product = "
          f"{100*roof/us:.1f}% of LOGICAL roofline", flush=True)


def main():
    import bench

    V3 = [bench.build_config3()] + [bench.build_config3(value_seed=300 + i)
                                    for i in range(1, P)]
    run_case("config3", V3, mirror=False)
    S2 = [bench.build_config2()] + [bench.build_config2(value_seed=200 + i)
                                    for i in range(1, P)]
    run_case("config2", S2, mirror=True)


if __name__ == "__main__":
    main()
