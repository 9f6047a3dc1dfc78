"""Round-4 probe: bisect the panel kernel's ~3.6 us fixed cost (config1).

proto_r4_floor2.py measured the pallas launch floor at ~0.5 us, so the
gap between the panel kernel (8.6 us) and its wire time (4.7 us) is
internal.  Timing-only kernel ablations on config1's panel2 plan:

  F  full mono kernel (reference point)
  G  no in-kernel gather (xs zeros constant)        -> gather cost
  H  no scatter matmul (yf summed into y8[0:RW])    -> dynamic-ds cost
  I  no one-hots at all; yf = sum(V) rows           -> pure stream+reduce
  J  I without the lane reduce (sum sublanes)       -> pure stream
  K  full kernel at different slab counts (TS_max forcing)

Run: python benchmarks/proto_r4_bisect.py
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

from blocksparse_tpu.core.panel2 import (  # noqa: E402
    _layout_entries, build_panel2_plan)
from blocksparse_tpu.core.strip import CC, RC  # noqa: E402
from blocksparse_tpu.ops.pallas.panel2_spmv import (  # noqa: E402
    _ohdot, _onehots, panel2_device_arrays)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9


def t_us(fn, x):
    st = chained_time_per_iter(fn, x, iters_lo=20, iters_hi=120, repeats=5,
                               reduce="stats")
    return st["median"] * 1e6


def make_kern(mode, RW, CW, seg, NCp):
    def kern(b8_ref, x32_ref, sid_ref, vals_ref, rid_ref, cid_ref, y8_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y8_ref[:] = jnp.zeros_like(y8_ref)

        V = vals_ref[:]
        if mode == "J":
            y8_ref[0:RW, :] += jnp.sum(V[0:RW], axis=1)[:, 0:RC]
            return
        if mode == "I":
            yf = jnp.sum(V, axis=2)
            y8_ref[0:RW, :] += yf[0:RW]
            return
        R, CT = _onehots(rid_ref, cid_ref, RW, CW)
        if mode == "G":
            xs = jnp.zeros((CW, CC), jnp.float32) + 1.0
        else:
            x32 = x32_ref[:]
            nsg = CC // seg
            parts = []
            for sub in range(nsg):
                sid = sid_ref[0, sub]
                OHT = (jax.lax.broadcasted_iota(jnp.int32, (NCp, CW), 0)
                       == sid[None, :]).astype(jnp.float32)
                parts.append(_dg0(OHT, x32))
            xs = jnp.concatenate(parts, axis=1)
        xg = _dg0(CT, xs)
        yf = jnp.sum(V * xg[:, None, :], axis=2)
        if mode == "H":
            y8_ref[0:RW, :] += jnp.dot(
                R, yf, preferred_element_type=jnp.float32, precision=HI)
        else:
            base = b8_ref[s]
            y8_ref[pl.ds(base, RW), :] += jnp.dot(
                R, yf, preferred_element_type=jnp.float32, precision=HI)
    return kern


def time_mode(plan, dev, mode, label):
    S, TS, CW, RW, n8p = plan.S, plan.TS, plan.CW, plan.RW, plan.n8p
    seg, NCp = plan.seg, plan.NC
    nsg = CC // seg
    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.standard_normal(plan.ncols).astype(np.float32)
                      .reshape(NCp, seg))
    kern = make_kern(mode, RW, CW, seg, NCp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(S,),
        in_specs=[
            pl.BlockSpec((NCp, seg), lambda s, b: (0, 0)),
            pl.BlockSpec((1, nsg, CW), lambda s, b: (s, 0, 0)),
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
            flops=2 * dev["vals"].size, bytes_accessed=dev["vals"].size * 4,
            transcendentals=0),
    )

    def step(xc):
        y8 = call(dev["b8"], xc, dev["segid_mono"], dev["vals"],
                  dev["rid8"], dev["cid8"])
        return xc + y8[0, 0] * 1e-30

    us = t_us(step, x32)
    wire = (plan.tile_bytes + plan.aux_bytes) / BW * 1e6
    print(f"  [{label}] {us:.2f} us (wire {wire:.2f}, rate {100*wire/us:.0f}%)",
          flush=True)
    return us


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    A1 = bench.build_config1()
    entries = _layout_entries(A1._layout, transpose=False)

    for ts_max in (1024, 9999):
        plan = build_panel2_plan(entries, A1.shape, seg=32, TS_max=ts_max)
        print(f"TS_max={ts_max}: S={plan.S} TS={plan.TS} CW={plan.CW} "
              f"RW={plan.RW}", flush=True)
        dev = panel2_device_arrays(plan)
        if ts_max == 1024:
            for mode, label in (("F", "F full"), ("G", "G no-gather"),
                                ("H", "H static-scatter"),
                                ("I", "I stream+reduce"),
                                ("J", "J stream only")):
                time_mode(plan, dev, mode, label)
        else:
            time_mode(plan, dev, "F", "F full")


if __name__ == "__main__":
    main()
