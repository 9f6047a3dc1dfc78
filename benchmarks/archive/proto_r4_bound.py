"""Round-4 probe: is the panel mirror kernel VPU- or MXU-bound?

Timing-only ablations (results are numerically wrong on purpose):
  A0  mirror, as shipped (HIGHEST one-hot matmuls)       -- baseline
  A1  mirror, one-hot matmuls at DEFAULT (1 bf16 pass)   -- if much faster,
      the kernel is MXU-bound on f32 matmul passes
  A2  mirror, mixed precision (DEFAULT one-hot side, HIGHEST data side)
      via jax.lax.dot_general precision=(lhs, rhs) tuples -- the candidate
      exact-but-cheap configuration (one-hot is exact in bf16)
  A3  mirror, reduces crippled to 2-op partial sums      -- if much faster,
      the kernel is VPU-bound on the reduction trees
  P0/P1/P3  same for the plain kernel on config3

Run: python benchmarks/proto_r4_bound.py
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
from blocksparse_tpu.ops.pallas.panel_spmv import _gather_xs  # noqa: E402
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
DEF = jax.lax.Precision.DEFAULT
BW = 819e9


def onehots(rid_ref, cid_ref, RW, CW):
    ridv = rid_ref[0]
    cidv = cid_ref[0]
    TS = ridv.shape[-1]
    R = (jax.lax.broadcasted_iota(jnp.int32, (RW, TS), 0)
         == ridv).astype(jnp.float32)
    CT = (jax.lax.broadcasted_iota(jnp.int32, (CW, TS), 0)
          == cidv).astype(jnp.float32)
    return R, CT


def dg0(a, b, prec):
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def make_mirror(prec, cripple, RW, CW):
    def kern(b8_ref, xs_ref, x8_ref, vals_ref, rid_ref, cid_ref,
             y8_ref, ym_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y8_ref[:] = jnp.zeros_like(y8_ref)

        V = vals_ref[:]
        R, CT = onehots(rid_ref, cid_ref, RW, CW)
        base = b8_ref[s]
        xg = dg0(CT, xs_ref[0], prec)
        xw = x8_ref[pl.ds(base, RW), :]
        xr = dg0(R, xw, prec)
        if cripple:
            t1 = V * xg[:, None, :]
            yf = t1[:, :, 0:64].sum(axis=2) + t1[:, :, 64:128].sum(axis=2)
            yf = yf * 0.5  # keep magnitudes sane; wrong on purpose
            t2 = V * xr[:, :, None]
            yt = t2[:, 0] + t2[:, 1]
        else:
            yf = jnp.sum(V * xg[:, None, :], axis=2)
            yt = jnp.sum(V * xr[:, :, None], axis=1)
        y8_ref[pl.ds(base, RW), :] += jnp.dot(
            R, yf, preferred_element_type=jnp.float32, precision=prec)
        ym_ref[0] = jnp.dot(CT, yt, preferred_element_type=jnp.float32,
                            precision=prec)
    return kern


def make_plain(prec, cripple, RW, CW):
    def kern(b8_ref, xs_ref, vals_ref, rid_ref, cid_ref, y8_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y8_ref[:] = jnp.zeros_like(y8_ref)

        V = vals_ref[:]
        R, CT = onehots(rid_ref, cid_ref, RW, CW)
        base = b8_ref[s]
        xg = dg0(CT, xs_ref[0], prec)
        if cripple:
            t1 = V * xg[:, None, :]
            yf = t1[:, :, 0:64].sum(axis=2) + t1[:, :, 64:128].sum(axis=2)
        else:
            yf = jnp.sum(V * xg[:, None, :], axis=2)
        y8_ref[pl.ds(base, RW), :] += jnp.dot(
            R, yf, preferred_element_type=jnp.float32, precision=prec)
    return kern


def run_mirror(plan, dev, label, prec, cripple):
    vals, rid8, cid8, segid, b8, omap = dev
    S, TS, CW, RW, n8p = plan.S, plan.TS, plan.CW, plan.RW, plan.n8p
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(plan.ncols).astype(np.float32))
    xs0 = _gather_xs(x, jnp.asarray(plan.segid), S, CW, plan.NC32, plan.ncols, plan.grids_used)
    pad = n8p * RC - plan.nrows
    x8 = (jnp.pad(x, (0, pad)) if pad else x).reshape(n8p, RC)
    kern = make_mirror(prec, cripple, RW, CW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(S,),
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
    call = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n8p, RC), jnp.float32),
                   jax.ShapeDtypeStruct((S, CW, CC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * vals.size, bytes_accessed=vals.size * 4,
            transcendentals=0),
    )

    def step(xs):
        y8, ym = call(b8, xs, x8, vals, rid8, cid8)
        return xs + y8[0, 0] * 1e-30 + ym[0, 0, 0] * 1e-30

    st = chained_time_per_iter(step, xs0, iters_lo=10, iters_hi=60,
                               repeats=5, reduce="stats")
    us = st["median"] * 1e6
    wire = (plan.tile_bytes + plan.aux_bytes) / BW * 1e6
    print(f"  [{label}] {us:.1f} us (wire {wire:.1f}, rate {100*wire/us:.0f}%)",
          flush=True)


def run_plain(plan, dev, label, prec, cripple):
    vals, rid8, cid8, segid, b8, omap = dev
    S, TS, CW, RW, n8p = plan.S, plan.TS, plan.CW, plan.RW, plan.n8p
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(plan.ncols).astype(np.float32))
    xs0 = _gather_xs(x, jnp.asarray(plan.segid), S, CW, plan.NC32, plan.ncols, plan.grids_used)
    kern = make_plain(prec, cripple, RW, CW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(S,),
        in_specs=[
            pl.BlockSpec((1, CW, CC), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((TS, RC, CC), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
    )
    call = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n8p, RC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size, bytes_accessed=vals.size * 4,
            transcendentals=0),
    )

    def step(xs):
        y8 = call(b8, xs, vals, rid8, cid8)
        return xs + y8[0, 0] * 1e-30

    st = chained_time_per_iter(step, xs0, iters_lo=10, iters_hi=60,
                               repeats=5, reduce="stats")
    us = st["median"] * 1e6
    wire = (plan.tile_bytes + plan.aux_bytes) / BW * 1e6
    print(f"  [{label}] {us:.1f} us (wire {wire:.1f}, rate {100*wire/us:.0f}%)",
          flush=True)


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    S = bench.build_config2()
    p2 = S._panel_for(False)
    assert p2[0].mirror
    print(f"config2 mirror S={p2[0].S} TS={p2[0].TS} CW={p2[0].CW}:")
    run_mirror(p2[0], p2[1], "A0 HIGHEST", HI, False)
    run_mirror(p2[0], p2[1], "A1 DEFAULT-matmuls", DEF, False)
    try:
        run_mirror(p2[0], p2[1], "A2 mixed (DEF,HI)", (DEF, HI), False)
    except Exception as e:
        print(f"  [A2 mixed] failed: {type(e).__name__}: {str(e)[:200]}")
    run_mirror(p2[0], p2[1], "A3 crippled reduces", HI, True)

    V = bench.build_config3()
    p3 = V._panel_for(False)
    print(f"config3 plain S={p3[0].S} TS={p3[0].TS} CW={p3[0].CW}:")
    run_plain(p3[0], p3[1], "P0 HIGHEST", HI, False)
    run_plain(p3[0], p3[1], "P1 DEFAULT-matmuls", DEF, False)
    try:
        run_plain(p3[0], p3[1], "P2 mixed (DEF,HI)", (DEF, HI), False)
    except Exception as e:
        print(f"  [P2 mixed] failed: {type(e).__name__}: {str(e)[:200]}")
    run_plain(p3[0], p3[1], "P3 crippled reduce", HI, True)


if __name__ == "__main__":
    main()
