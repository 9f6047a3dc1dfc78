"""Round-5 probe: batched multi-operand products -- one launch for P products.

config4's piped floor (~17.4 us/product = 52%) is MXU ~11 us + per-kernel
x/y VMEM staging that cannot overlap across serialized kernel launches
(proto_r5_spmm2/3, proto_r5_async).  Running P independent same-structure
products as ONE pallas launch with grid (P, steps) lets Mosaic's block
pipeline prefetch product p+1's x/vals during product p's compute -- the
staging overlaps, the MXU stays busy.

Also probes the SpMV analog: a P-batched minimal-op XLA chain (leading
batch dim on gather/einsum/scatter) amortizes the op floors over P
products (config1 piped 5.3 us/product = 76%; the serialized ops are the
gap to the ~4.0 us roofline).

Run on the TPU: python benchmarks/proto_r5_batched.py
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

from blocksparse_tpu.core.patch import CC, build_patch_plan  # noqa: E402
from blocksparse_tpu.ops.patch_engine import (  # noqa: E402
    _rows_c, _rows_r, _slot_dot, patch_device_arrays)
from blocksparse_tpu.ops.xla_spmv import _multi_host_tables  # noqa: E402
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9
R = 128
P = 4


def kern_batched(cc_ref, rs_ref, x_ref, v_ref, y_ref, *, G, KC_, MP, prec):
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


def main():
    import bench

    A = bench.build_config1()
    As = [A] + [bench.build_config1(value_seed=100 + i)
                for i in range(1, P)]
    n = A.shape[0]
    roof4 = (A.nnz * 4 + 2 * n * R * 4) / BW * 1e6
    roof1 = (A.nnz * 4 + 2 * n * 4) / BW * 1e6
    rng = np.random.default_rng(1)

    # ---- batched SpMM mono-kernel --------------------------------------
    plans = [build_patch_plan(Ai._layout) for Ai in As]
    plan = plans[0]
    b = plan.buckets[0]
    G, MP, KP = b.G, b.MP, b.KP
    KC_ = KP // CC
    steps = b.nb // G
    devs = [patch_device_arrays(p) for p in plans]
    vals_stack = jnp.stack([d[0][0] for d in devs])        # [P, nb, MP, KP]
    cc, rs = devs[0][0][4], devs[0][0][5]
    xrows, yrows = _rows_c(plan), _rows_r(plan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, steps),
        in_specs=[
            pl.BlockSpec((1, xrows, R), lambda p, s, c, r: (p, 0, 0)),
            pl.BlockSpec((1, G, MP, KP), lambda p, s, c, r: (p, s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, yrows, R), lambda p, s, c, r: (p, 0, 0)),
    )
    call = pl.pallas_call(
        functools.partial(kern_batched, G=G, KC_=KC_, MP=MP, prec="highest"),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, yrows, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals_stack.size * R,
            bytes_accessed=vals_stack.size * 4 + P * (xrows + yrows) * R * 4,
            transcendentals=0),
    )

    @jax.jit
    def batched_mm(Xs):                                   # [P, n, R]
        Xp = jnp.pad(Xs, ((0, 0), (0, xrows - n), (0, 0)))
        return call(cc, rs, Xp, vals_stack)[:, :n]

    Xs = jnp.asarray(rng.standard_normal((P, n, R)).astype(np.float32))
    out = np.asarray(batched_mm(Xs))
    for i in range(P):
        ref = np.asarray(As[i] @ Xs[i])
        err = np.max(np.abs(out[i] - ref)) / np.max(np.abs(ref))
        assert err < 1e-5, (i, err)
    print("batched SpMM correctness ok", flush=True)
    t = chained_time_per_iter(
        lambda Xc: batched_mm(Xc) * 1e-3, Xs, iters_lo=3, iters_hi=10,
        repeats=5, reduce="stats")
    us = t["median"] * 1e6 / P
    print(f"  [batched SpMM P={P}] {us:.1f} us/product "
          f"({100*roof4/us:.0f}% of roofline)", flush=True)

    # ---- batched SpMV minimal-op chain ---------------------------------
    hbs = [hb for hb in A._layout.buckets if hb.chunk > 1]
    C = hbs[0].chunk
    gidx, goff, sOH, g_max = _multi_host_tables(tuple(hbs), n, False)
    vstacks = []
    for bi, hb in enumerate(hbs):
        vstacks.append(jnp.stack([
            jnp.asarray(np.asarray(
                [b2 for b2 in Ai._layout.buckets if b2.chunk > 1][bi].values,
                np.float32)) for Ai in As]))

    @jax.jit
    def batched_mv(xs):                                   # [P, n]
        W = -(-n // C)
        rows_in = max(W * C, (g_max + 1) * C)
        x2 = jnp.pad(xs, ((0, 0), (0, rows_in - n))).reshape(
            P, rows_in // C, C)
        xg_all = x2[:, gidx]                              # [P, Gtot, C]
        rows = []
        for bi, v in enumerate(vstacks):
            nb, mp, kp = v.shape[1:]
            xg = xg_all[:, goff[bi]:goff[bi + 1]].reshape(P, nb, kp)
            yp = jnp.einsum("pbmk,pbk->pbm", v, xg,
                            preferred_element_type=jnp.float32,
                            precision=HI)
            rows.append(yp.reshape(P, nb * (mp // C), C))
        allrows = jnp.concatenate(rows, axis=1)
        u = jnp.einsum("wr,prc->pwc", sOH.astype(jnp.float32), allrows,
                       precision=HI)
        return u.reshape(P, W * C)[:, :n]

    xs = jnp.asarray(rng.standard_normal((P, n)).astype(np.float32))
    out = np.asarray(batched_mv(xs))
    for i in range(P):
        ref = np.asarray(As[i] @ xs[i])
        err = np.max(np.abs(out[i] - ref)) / np.max(np.abs(ref))
        assert err < 1e-4, (i, err)
    print("batched SpMV correctness ok", flush=True)
    t = chained_time_per_iter(
        lambda xc: batched_mv(xc) * 1e-3, xs, iters_lo=5, iters_hi=30,
        repeats=5, reduce="stats")
    us = t["median"] * 1e6 / P
    print(f"  [batched SpMV P={P}] {us:.2f} us/product "
          f"({100*roof1/us:.0f}% of roofline)", flush=True)


if __name__ == "__main__":
    main()
