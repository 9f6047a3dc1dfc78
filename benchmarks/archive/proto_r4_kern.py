"""Round-4 probe: panel-kernel contraction variants, kernel-only.

The dissection (proto_r4_dissect.py) shows the plain panel kernel streams
at 43-79% of wire and the mirror kernel at ~49%; the x-gather outside the
kernel adds 4-10 us.  This probe times ONLY the pallas_call (xs fixed,
chained through a tiny feedback term) for variant formulations of the
per-tile contraction:

  P0  mul + jnp.sum(axis=2)              (current plain)
  P1  batched dot_general                (let Mosaic pick the engine)
  P2  mul + MXU ones-matmul reduce
  M0  current mirror
  M1  mirror with dot_general contractions

Run: python benchmarks/proto_r4_kern.py
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
from blocksparse_tpu.ops.pallas.panel_spmv import (  # noqa: E402
    _dg0, _gather_xs, _onehots, panel_device_arrays)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9


def contraction_v0(V, xg):
    return jnp.sum(V * xg[:, None, :], axis=2)                  # [TS, 8]


def contraction_v1(V, xg):
    return jax.lax.dot_general(
        V, xg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=HI)       # [TS, 8]


def contraction_v2(V, xg):
    TS = V.shape[0]
    tmp = (V * xg[:, None, :]).reshape(TS * RC, CC)
    ones = jnp.ones((CC, 8), jnp.float32)
    red = jnp.dot(tmp, ones, preferred_element_type=jnp.float32,
                  precision=HI)                                 # [TS*8, 8]
    return red[:, 0].reshape(TS, RC)


CONTRACT = {"P0": contraction_v0, "P1": contraction_v1, "P2": contraction_v2}


def make_plain(contract, RW, CW):
    def kern(b8_ref, xs_ref, vals_ref, rid_ref, cid_ref, y8_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y8_ref[:] = jnp.zeros_like(y8_ref)

        V = vals_ref[:]
        R, CT = _onehots(rid_ref, cid_ref, RW, CW)
        base = b8_ref[s]
        xg = _dg0(CT, xs_ref[0])
        yf = contract(V, xg)
        y8_ref[pl.ds(base, RW), :] += jnp.dot(
            R, yf, preferred_element_type=jnp.float32, precision=HI)
    return kern


def mirror_v0(V, xg, xr):
    yf = jnp.sum(V * xg[:, None, :], axis=2)
    yt = jnp.sum(V * xr[:, :, None], axis=1)
    return yf, yt


def mirror_v1(V, xg, xr):
    yf = jax.lax.dot_general(
        V, xg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=HI)
    yt = jax.lax.dot_general(
        V, xr, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=HI)
    return yf, yt


MIRROR = {"M0": mirror_v0}


def make_mirror(mcontract, RW, CW):
    def kern(b8_ref, xs_ref, x8_ref, vals_ref, rid_ref, cid_ref,
             y8_ref, ym_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y8_ref[:] = jnp.zeros_like(y8_ref)

        V = vals_ref[:]
        R, CT = _onehots(rid_ref, cid_ref, RW, CW)
        base = b8_ref[s]
        xg = _dg0(CT, xs_ref[0])
        xw = x8_ref[pl.ds(base, RW), :]
        xr = _dg0(R, xw)
        yf, yt = mcontract(V, xg, xr)
        y8_ref[pl.ds(base, RW), :] += jnp.dot(
            R, yf, preferred_element_type=jnp.float32, precision=HI)
        ym_ref[0] = jnp.dot(CT, yt, preferred_element_type=jnp.float32,
                            precision=HI)
    return kern


def time_plain(plan, dev, name, kern_name):
    vals, rid8, cid8, segid, b8, omap = dev
    S, TS, CW, RW, n8p = plan.S, plan.TS, plan.CW, plan.RW, plan.n8p
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(plan.ncols).astype(np.float32))
    xs0 = _gather_xs(x, jnp.asarray(plan.segid), S, CW, plan.NC32, plan.ncols, plan.grids_used)
    kern = make_plain(CONTRACT[kern_name], RW, CW)
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
    print(f"  [{name}/{kern_name}] {us:.1f} us  (wire {wire:.1f} us, "
          f"rate {100*wire/us:.0f}%)")
    return us


def time_mirror(plan, dev, name, kern_name):
    vals, rid8, cid8, segid, b8, omap = dev
    S, TS, CW, RW, n8p = plan.S, plan.TS, plan.CW, plan.RW, plan.n8p
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(plan.ncols).astype(np.float32))
    xs0 = _gather_xs(x, jnp.asarray(plan.segid), S, CW, plan.NC32, plan.ncols, plan.grids_used)
    pad = n8p * RC - plan.nrows
    x8 = (jnp.pad(x, (0, pad)) if pad else x).reshape(n8p, RC)
    kern = make_mirror(MIRROR[kern_name], RW, CW)
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
    print(f"  [{name}/{kern_name}] {us:.1f} us  (wire {wire:.1f} us, "
          f"rate {100*wire/us:.0f}%)")
    return us


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    A1 = bench.build_config1()
    p1 = A1._panel_for(False)
    print(f"config1 plain (S={p1[0].S} TS={p1[0].TS} CW={p1[0].CW}):")
    for k in CONTRACT:
        time_plain(p1[0], p1[1], "config1", k)

    V = bench.build_config3()
    p3 = V._panel_for(False)
    print(f"config3 plain (S={p3[0].S} TS={p3[0].TS} CW={p3[0].CW}):")
    for k in CONTRACT:
        time_plain(p3[0], p3[1], "config3", k)

    S = bench.build_config2()
    p2 = S._panel_for(False)
    print(f"config2 mirror={p2[0].mirror} (S={p2[0].S} TS={p2[0].TS}):")
    if p2[0].mirror:
        for k in MIRROR:
            time_mirror(p2[0], p2[1], "config2", k)
    else:
        for k in CONTRACT:
            time_plain(p2[0], p2[1], "config2", k)


if __name__ == "__main__":
    main()
