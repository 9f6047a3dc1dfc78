"""Round-5 probe: async in-kernel x-gather for the patch SpMM mono-kernel.

proto_r5_spmm2/3 located config4's piped floor: MXU ~11 us + x-VMEM
prologue (~2.4 us) + y epilogue (~2.4 us) + step taxes ~= 17.4 us.  The
x block (xrows x R, constant index map) is fetched entirely before step
0.  Variant X keeps x in HBM (memory_space=ANY) and DMAs each slot's
column chunks into a double-buffered VMEM scratch, overlapping the
per-slot gather with the previous slot's MXU dot -- killing the
prologue.  Risk probed: per-chunk DMA issue cost (KC_ x nb small copies).

Run on the TPU: python benchmarks/proto_r5_async.py
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
    _slot_dot, _rows_c, _rows_r, patch_device_arrays, patch_spmm)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9
R = 128
PIPE = 4


def measure(apply_fn, n, label, roof_us):
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    dep = chained_time_per_iter(
        lambda V: apply_fn(0, V) * 1e-3, X, iters_lo=5, iters_hi=25,
        repeats=5, reduce="stats")
    Xp = jnp.asarray(rng.standard_normal((n, R * PIPE)).astype(np.float32))

    def piped(Xc):
        parts = [apply_fn(i, Xc[:, i * R:(i + 1) * R]) for i in range(PIPE)]
        return jnp.concatenate(parts, axis=1) * 1e-3

    pip = chained_time_per_iter(piped, Xp, iters_lo=3, iters_hi=10,
                                repeats=5, reduce="stats")
    d, p = dep["median"] * 1e6, pip["median"] * 1e6 / PIPE
    print(f"  [{label}] piped {p:.1f} us ({100*roof_us/p:.0f}%) | "
          f"dep {d:.1f} us ({100*roof_us/d:.0f}%)", flush=True)


def kern_async_x(cc_ref, rs_ref, x_hbm, v_ref, y_ref, xg_ref, sem_ref,
                 *, G, KC_, MP, KP, steps, prec):
    s = pl.program_id(0)

    def copies(b, buf):
        out = []
        for j in range(KC_):
            out.append(pltpu.make_async_copy(
                x_hbm.at[pl.ds(cc_ref[b, j] * CC, CC), :],
                xg_ref.at[buf, pl.ds(j * CC, CC), :],
                sem_ref.at[buf, j],
            ))
        return out

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)
        for dma in copies(0, 0):
            dma.start()

    for g in range(G):
        b = s * G + g
        buf = g % 2
        # issue slot b+1 into the other buffer before waiting on this one
        if g < G - 1:
            for dma in copies(b + 1, (g + 1) % 2):
                dma.start()
        else:
            @pl.when(s + 1 < steps)
            def _():
                for dma in copies((s + 1) * G, (g + 1) % 2):
                    dma.start()
        for dma in copies(b, buf):
            dma.wait()
        xg = xg_ref[buf]                              # [KP, R]
        yp = _slot_dot(v_ref[g], xg, prec)
        y_ref[pl.ds(rs_ref[b], MP), :] += yp


def main():
    import bench

    A = bench.build_config1()
    As = [A] + [bench.build_config1(value_seed=100 + i)
                for i in range(1, PIPE)]
    n = A.shape[0]
    roof_us = (A.nnz * 4 + 2 * n * R * 4) / BW * 1e6
    print(f"config4: roofline {roof_us:.1f} us", flush=True)
    rng = np.random.default_rng(1)
    Xo = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    Yo = np.asarray(A @ Xo)

    plans = [build_patch_plan(Ai._layout) for Ai in As]  # even-step default
    plan = plans[0]
    b = plan.buckets[0]
    devs = [patch_device_arrays(p) for p in plans]
    G, MP, KP = b.G, b.MP, b.KP
    KC_ = KP // CC
    steps = b.nb // G
    print(f"plan: G={G} steps={steps} MP={MP} KP={KP}", flush=True)

    def apply0(i, X):
        return patch_spmm(plan, devs[i], X, precision="highest")
    measure(apply0, n, "V0 shipped (even-step)", roof_us)

    rows_c, rows_r = _rows_c(plan), _rows_r(plan)
    xrows, yrows = rows_c, rows_r
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((G, MP, KP), lambda s, c, r: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((yrows, R), lambda s, c, r: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, KP, R), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KC_)),
        ],
    )
    call = pl.pallas_call(
        functools.partial(kern_async_x, G=G, KC_=KC_, MP=MP, KP=KP,
                          steps=steps, prec="highest"),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((yrows, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b.vals.size * R, bytes_accessed=b.vals.size * 4,
            transcendentals=0),
    )

    def apply1(i, X):
        vals, _g, _s, _f, cc, rs, mk = devs[i][0]
        Xp = jnp.pad(X, ((0, xrows - X.shape[0]), (0, 0)))
        y = call(cc, rs, Xp, vals)
        return y[:n]

    out = np.asarray(apply1(0, Xo))
    err = np.max(np.abs(out - Yo)) / np.max(np.abs(Yo))
    print(f"  VX relerr {err:.2e}", flush=True)
    assert err < 1e-5
    measure(apply1, n, "VX async-x", roof_us)


if __name__ == "__main__":
    main()
