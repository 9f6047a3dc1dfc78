"""Round-3 probe: decompose panel-engine cost = kernel + x-pregather.

(a) panel kernel alone, xs built by a free reshape (wrong values, right
    shapes) -- the kernel's streaming rate;
(b) gather variants for building xs:
      g-elem   xext[xidx]                    element gather (suspect ~7.5ns/el)
      g-row32  x32[rows]                     32-wide row gather (seg level)
      g-row128 x128[rows]                    128-wide row gather (chunk level)
      g-slice  vmap dynamic_slice [nslot,W]  slot-level slice gather
      g-onehot einsum one-hot [K4,NC32]@x32  MXU gather

Run: nohup python benchmarks/proto_r3_gather.py > /tmp/gather.log 2>&1 &
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_config2, build_config_s  # noqa: E402
from blocksparse_tpu.ops.pallas.panel_spmv import _launch  # noqa: E402
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402


def tm(fn, x, lo=8, hi=40):
    st = chained_time_per_iter(lambda v: fn(v), x, iters_lo=lo,
                               iters_hi=hi, repeats=5, reduce="stats")
    return st["min"], st["median"]


def main():
    rng = np.random.default_rng(2)
    for name, build in (("c2", build_config2), ("cS", build_config_s)):
        A = build()
        entry = A._panel_for(False)
        plan, dev = entry
        n = A.shape[1]
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        S, TS, CW, RW = plan.S, plan.TS, plan.CW, plan.RW
        meta = (S, TS, CW, RW, plan.n8p, plan.nrows, plan.ncols,
                plan.mirror, plan.NS)

        # (a) kernel alone: monkeypatch xs to a cheap broadcast
        import blocksparse_tpu.ops.pallas.panel_spmv as M
        vals, rs, cs, xidx, b8, omap, yback = dev
        need = S * CW * 128

        def fn_kernel(v):
            # cheap xs: tile v into the right shape (pad/reshape only)
            reps = -(-need // v.shape[0])
            xs = jnp.tile(v, reps)[:need].reshape(S, CW, 128)
            return _kernel_only(xs, v)

        from functools import partial
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from blocksparse_tpu.ops.pallas.panel_spmv import (
            _pkern_plain, _pkern_mirror)

        RC, CC = 8, 128

        @jax.jit
        def _kernel_only(xs, v):
            params = dict(
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
                cost_estimate=pl.CostEstimate(
                    flops=2 * vals.size, bytes_accessed=vals.size * 4,
                    transcendentals=0),
            )
            if plan.mirror:
                x8pad = plan.n8p * RC - plan.nrows
                x8 = (jnp.pad(v, (0, x8pad)) if x8pad else v).reshape(
                    plan.n8p, RC)
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(S,),
                    in_specs=[
                        pl.BlockSpec((1, CW, CC), lambda s, b: (s, 0, 0)),
                        pl.BlockSpec((plan.n8p, RC), lambda s, b: (0, 0)),
                        pl.BlockSpec((TS, RC, CC), lambda s, b: (s, 0, 0)),
                        pl.BlockSpec((1, RW, TS), lambda s, b: (s, 0, 0)),
                        pl.BlockSpec((1, TS, CW), lambda s, b: (s, 0, 0)),
                    ],
                    out_specs=[
                        pl.BlockSpec((plan.n8p, RC), lambda s, b: (0, 0)),
                        pl.BlockSpec((1, CW, CC), lambda s, b: (s, 0, 0)),
                    ],
                )
                y8, ym = pl.pallas_call(
                    partial(_pkern_mirror, RW=RW), grid_spec=grid_spec,
                    out_shape=[
                        jax.ShapeDtypeStruct((plan.n8p, RC), jnp.float32),
                        jax.ShapeDtypeStruct((S, CW, CC), jnp.float32)],
                    **params)(b8, xs, x8, vals, rs, cs)
                return y8.reshape(-1)[:plan.nrows] + ym[0, 0, :plan.nrows % 128 or 128].sum() * 0
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(S,),
                in_specs=[
                    pl.BlockSpec((1, CW, CC), lambda s, b: (s, 0, 0)),
                    pl.BlockSpec((TS, RC, CC), lambda s, b: (s, 0, 0)),
                    pl.BlockSpec((1, RW, TS), lambda s, b: (s, 0, 0)),
                    pl.BlockSpec((1, TS, CW), lambda s, b: (s, 0, 0)),
                ],
                out_specs=pl.BlockSpec((plan.n8p, RC), lambda s, b: (0, 0)),
            )
            y8 = pl.pallas_call(
                partial(_pkern_plain, RW=RW), grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((plan.n8p, RC), jnp.float32),
                **params)(b8, xs, vals, rs, cs)
            return y8.reshape(-1)[:plan.nrows]

        sbytes = plan.tile_bytes + plan.aux_bytes
        dmin, dmed = tm(lambda v: fn_kernel(v)[:n] * 1e-3, x)
        print(f"{name} kernel-only : {dmin*1e6:7.1f}/{dmed*1e6:7.1f} us "
              f"({sbytes/dmed/1e9:5.0f} GB/s)", flush=True)

        # (b) gather variants
        K4 = S * CW * 4
        NC32 = -(-n // 32)
        x32pad = NC32 * 32 - n

        def pad32(v):
            return (jnp.pad(v, (0, x32pad)) if x32pad else v).reshape(
                NC32, 32)

        gidx = jnp.asarray(
            np.random.default_rng(3).integers(0, n, S * CW * 128),
            jnp.int32)
        fns = {
            "g-elem ": lambda v: jnp.concatenate(
                [v, jnp.zeros(1, jnp.float32)])[xidx].sum(1)[:n % 97 + 1]
            * 1e-3 + v[:1] * 0 if False else
            jnp.concatenate([v, jnp.zeros(1, jnp.float32)])[xidx].sum()
            * jnp.ones(n) * 1e-9 + v * 1e-3,
        }
        # element gather
        def g_elem(v):
            xs = jnp.concatenate([v, jnp.zeros(1, jnp.float32)])[xidx]
            return xs.sum() * jnp.ones(n) * 1e-9 + v * 1e-3
        # 32-row gather
        rows32 = jnp.asarray(
            np.random.default_rng(4).integers(0, NC32, K4), jnp.int32)
        def g_row32(v):
            xs = pad32(v)[rows32]
            return xs.sum() * jnp.ones(n) * 1e-9 + v * 1e-3
        # 128-row gather
        NC = -(-n // 128)
        rows128 = jnp.asarray(
            np.random.default_rng(5).integers(0, NC, S * CW), jnp.int32)
        def g_row128(v):
            vp = jnp.pad(v, (0, NC * 128 - n)) if NC * 128 - n else v
            xs = vp.reshape(NC, 128)[rows128]
            return xs.sum() * jnp.ones(n) * 1e-9 + v * 1e-3
        # slot slice gather (vmap dynamic_slice, width 160)
        nslot = 208 if name == "c2" else 400
        starts = jnp.asarray(
            np.random.default_rng(6).integers(0, n - 160, nslot), jnp.int32)
        def g_slice(v):
            xs = jax.vmap(
                lambda s0: jax.lax.dynamic_slice(v, (s0,), (160,)))(starts)
            return xs.sum() * jnp.ones(n) * 1e-9 + v * 1e-3
        # one-hot MXU gather at seg granularity
        oh = np.zeros((K4, NC32), np.float32)
        oh[np.arange(K4), np.random.default_rng(7).integers(0, NC32, K4)] = 1
        ohj = jnp.asarray(oh, jnp.bfloat16)
        def g_onehot(v):
            xs = jnp.dot(ohj.astype(jnp.float32), pad32(v),
                         precision=jax.lax.Precision.HIGHEST)
            return xs.sum() * jnp.ones(n) * 1e-9 + v * 1e-3

        for nm, fn in (("g-elem  ", g_elem), ("g-row32 ", g_row32),
                       ("g-row128", g_row128), ("g-slice ", g_slice),
                       ("g-onehot", g_onehot)):
            try:
                gmin, gmed = tm(jax.jit(fn), x)
                print(f"{name} {nm}: {gmin*1e6:7.1f}/{gmed*1e6:7.1f} us",
                      flush=True)
            except Exception as e:
                print(f"{name} {nm}: FAIL {e}", flush=True)


if __name__ == "__main__":
    main()
