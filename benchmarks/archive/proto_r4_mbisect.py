"""Round-4 probe: bisect the v2 paired mirror kernel on config2's plan.

Timing-only ablations (numerically wrong on purpose):
  MF  full kernel                      (reference: ~40 us)
  Ma  map-back loop dropped
  Mb  whole mirror side dropped        (paired forward only)
  Mc  CT@yt dropped (ym = row slice)
  Md  yt sublane reductions dropped
  Me  forward xg gather replaced by constant (isolate CT-gather matmul)

Run: python benchmarks/proto_r4_mbisect.py
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

from blocksparse_tpu.core.panel2 import panel2_plan_symmetric  # noqa: E402
from blocksparse_tpu.core.strip import CC, RC  # noqa: E402
from blocksparse_tpu.ops.pallas.panel2_spmv import (  # noqa: E402
    _gather_xs2, _ohdot, panel2_device_arrays)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9


def make_kern(mode, RW, CW, seg, NYp):
    def kern(b8_ref, xs_ref, x8_ref, v0_ref, v1_ref, rid_ref, cid_ref,
             tgt_ref, y8_ref, ym32_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y8_ref[:] = jnp.zeros_like(y8_ref)
            ym32_ref[:] = jnp.zeros_like(ym32_ref)

        V0 = v0_ref[:]
        V1 = v1_ref[:]
        TS2 = V0.shape[0]
        ridv = rid_ref[0]
        cidv = cid_ref[0]
        R = (jax.lax.broadcasted_iota(jnp.int32, (RW, TS2), 0)
             == ridv).astype(jnp.bfloat16)
        CT = (jax.lax.broadcasted_iota(jnp.int32, (CW, 2 * TS2), 0)
              == cidv).astype(jnp.bfloat16)
        base = b8_ref[s]
        if mode == "Me":
            xg0 = jnp.zeros((TS2, CC), jnp.float32) + 1.0
            xg1 = xg0
        else:
            xg = _ohdot(CT, xs_ref[0], contract0=True)
            xg0, xg1 = xg[:TS2], xg[TS2:]
        tmp = V0 * xg0[:, None, :] + V1 * xg1[:, None, :]
        yf = jnp.sum(tmp, axis=2)
        y8_ref[pl.ds(base, RW), :] += _ohdot(R, yf)
        if mode == "Mb":
            return
        xw = x8_ref[pl.ds(base, RW), :]
        xr = _ohdot(R, xw, contract0=True)
        if mode == "Md":
            ym32_ref[:] += jnp.sum(xr)[None, None] * 1e-30
            return
        yt0 = jnp.sum(V0 * xr[:, :, None], axis=1)
        yt1 = jnp.sum(V1 * xr[:, :, None], axis=1)
        if mode == "Mc":
            ym32_ref[:] += (jnp.sum(yt0) + jnp.sum(yt1))[None, None] * 1e-30
            return
        yt = jnp.concatenate([yt0, yt1], axis=0)
        ym = _ohdot(CT, yt)
        if mode == "Ma":
            ym32_ref[:] += jnp.sum(ym)[None, None] * 1e-30
            return
        nsg = CC // seg
        acc = None
        for sub in range(nsg):
            tg = tgt_ref[0, sub]
            OMT = (jax.lax.broadcasted_iota(jnp.int32, (NYp, CW), 0)
                   == tg[None, :]).astype(jnp.bfloat16)
            part = _ohdot(OMT, ym[:, sub * seg:(sub + 1) * seg])
            acc = part if acc is None else acc + part
        ym32_ref[:] += acc
    return kern


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    S_op = bench.build_config2()
    plan = panel2_plan_symmetric(S_op._dlayout, S_op._olayout)
    assert plan.mirror
    dev = panel2_device_arrays(plan)
    S, TS, CW, RW, n8p, seg = (plan.S, plan.TS, plan.CW, plan.RW,
                               plan.n8p, plan.seg)
    TS2 = TS // 2
    nsg = CC // seg
    nrows = plan.nrows
    n_yseg = -(-nrows // seg)
    NYp = -(-n_yseg // 8) * 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(plan.ncols).astype(np.float32))
    xs0 = _gather_xs2(x, dev["segid"], S, CW, plan.NC, seg, plan.NG,
                      plan.ncols)
    x8pad = n8p * RC - nrows
    x8 = (jnp.pad(x, (0, x8pad)) if x8pad else x).reshape(n8p, RC)
    wire = (plan.tile_bytes + plan.aux_bytes) / BW * 1e6
    print(f"plan: S={S} TS={TS} CW={CW} seg={seg} wire={wire:.1f} us",
          flush=True)

    for mode in ("MF", "Mb", "Me", "Md", "Mc", "Ma"):
        kern = make_kern(mode, RW, CW, seg, NYp)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(S,),
            in_specs=[
                pl.BlockSpec((1, CW, CC), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
                pl.BlockSpec((TS2, RC, CC), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((TS2, RC, CC), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, 1, TS2), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, 1, TS), lambda s, b: (s, 0, 0)),
                pl.BlockSpec((1, nsg, CW), lambda s, b: (s, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((n8p, RC), lambda s, b: (0, 0)),
                pl.BlockSpec((NYp, seg), lambda s, b: (0, 0)),
            ],
        )
        call = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n8p, RC), jnp.float32),
                       jax.ShapeDtypeStruct((NYp, seg), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=4 * dev["vals"].size, bytes_accessed=dev["vals"].size * 8,
                transcendentals=0),
        )

        def step(xs):
            y8, ym32 = call(dev["b8"], xs, x8, dev["vals"], dev["vals1"],
                            dev["rid8"], dev["cid8"], dev["tgt"])
            return xs + y8[0, 0] * 1e-30 + ym32[0, 0] * 1e-30

        st = chained_time_per_iter(step, xs0, iters_lo=10, iters_hi=60,
                                   repeats=5, reduce="stats")
        us = st["median"] * 1e6
        print(f"  [{mode}] {us:.1f} us (rate {100*wire/us:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
