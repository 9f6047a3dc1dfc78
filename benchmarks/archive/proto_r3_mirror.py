"""Round-3 probe: mirror-kernel variants on config2 (real chip).

The plain panel kernel streams at 660-764 GB/s; the mirror variant sits at
~440-530.  Variants isolate the cost:

  v0  current kernel (VPU lane-reduce fwd, sublane-reduce mirror)
  v1  fwd lane-reduce as MXU dot-by-ones ((V*xg) @ ones128)
  v2  v1 + mirror sum via dot on reshaped (ones8 blockwise)
  v3  fwd-only (mirror compute removed; upper bound of the mirror kernel)
  v4  mirror-only (fwd removed)

Run: nohup python benchmarks/proto_r3_mirror.py > /tmp/mirror.log 2>&1 &
"""

import functools
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bench import build_config2  # noqa: E402
from blocksparse_tpu.core.strip import CC, RC  # noqa: E402
from blocksparse_tpu.ops.pallas.panel_spmv import _gather_xs  # noqa: E402
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST


def make_kernel(variant, RW):
    def kern(b8_ref, xs_ref, x8_ref, vals_ref, rs_ref, cs_ref,
             y8_ref, ym_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y8_ref[:] = jnp.zeros_like(y8_ref)

        V = vals_ref[:]
        TS = V.shape[0]
        R = rs_ref[0].astype(jnp.float32)
        C = cs_ref[0].astype(jnp.float32)
        base = b8_ref[s]
        if variant != "v4":
            xg = jnp.dot(C, xs_ref[0], preferred_element_type=jnp.float32,
                         precision=HI)
            if variant in ("v1", "v2"):
                ones = jnp.ones((CC, 1), jnp.float32)
                yf = jnp.dot((V * xg[:, None, :]).reshape(TS * RC, CC),
                             ones, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT
                             ).reshape(TS, RC)
            else:
                yf = jnp.sum(V * xg[:, None, :], axis=2)
            y8_ref[pl.ds(base, RW), :] += jnp.dot(
                R, yf, preferred_element_type=jnp.float32, precision=HI)
        if variant != "v3":
            xw = x8_ref[pl.ds(base, RW), :]
            xr = jnp.dot(R.T, xw, preferred_element_type=jnp.float32,
                         precision=HI)
            yt = jnp.sum(V * xr[:, :, None], axis=1)
            ym_ref[0] = jnp.dot(C.T, yt, preferred_element_type=jnp.float32,
                                precision=HI)
        else:
            ym_ref[0] = jnp.zeros_like(ym_ref[0])
    return kern


def main():
    rng = np.random.default_rng(3)
    A = build_config2()
    plan, dev = A._panel_for(False)
    vals, rs, cs, segid, b8, omap = dev
    S, TS, CW, RW = plan.S, plan.TS, plan.CW, plan.RW
    n = A.shape[1]
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    stream = plan.tile_bytes + plan.aux_bytes
    roof = ((plan.nrows and 1) and 1)  # noqa
    logical = 0
    logical = (A._dlayout.nnz + A._olayout.nnz) * 4 + 2 * n * 4
    roof = logical / 820e9

    for variant in ("v0", "v1", "v2", "v3", "v4"):
        if variant == "v2":
            continue  # v2 == v1 for now (sublane reduce already cheap)

        @jax.jit
        def fn(v, variant=variant):
            xf = v.astype(jnp.float32)
            xs = _gather_xs(xf, segid, S, CW, plan.NC32, n)
            x8pad = plan.n8p * RC - plan.nrows
            x8 = (jnp.pad(xf, (0, x8pad)) if x8pad else xf).reshape(
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
                make_kernel(variant, RW), grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((plan.n8p, RC), jnp.float32),
                    jax.ShapeDtypeStruct((S, CW, CC), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
                cost_estimate=pl.CostEstimate(
                    flops=4 * vals.size, bytes_accessed=stream,
                    transcendentals=0),
            )(b8, xs, x8, vals, rs, cs)
            y = y8.reshape(-1)[:plan.nrows]
            ym32 = ym.reshape(-1, 32)
            y32 = jnp.dot(omap.astype(jnp.float32).T, ym32, precision=HI)
            return y + y32.reshape(-1)[:plan.nrows]

        # correctness vs the xla backend
        import blocksparse_tpu as bst
        if variant in ("v0", "v1"):
            import copy
            B = copy.copy(A)
            B._backend = "xla"
            ref = np.asarray(B @ x)
            err = float(np.max(np.abs(np.asarray(fn(x)) - ref)))
            print(f"{variant} err vs xla: {err:.2e}", flush=True)

        st = chained_time_per_iter(lambda v: fn(v) * 1e-3, x, iters_lo=8,
                                   iters_hi=40, repeats=5, reduce="stats")
        print(f"{variant}: {st['min']*1e6:7.1f}/{st['median']*1e6:7.1f} us "
              f"= {100*roof/st['median']:5.1f}% logical "
              f"({stream/st['median']/1e9:5.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
