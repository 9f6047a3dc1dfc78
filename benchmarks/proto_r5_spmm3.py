"""Round-5 probe 3: where does config4's piped ~17 us floor come from?

proto_r5_spmm2: piped is flat (17-19 us) across canvas/G while dep
reaches 11.3 us (operand VMEM-residency in the chain).  Model: piped =
MXU (12.8 us at 6-pass M=64) + stream prologue + ~0.6 us/step tax.
Suspects for the tax: per-step y-block writeback, per-slot xg
concatenation copies.  Variants on the KCc=4 G=32 (4-step) plan:

  V0  shipped kernel (reference)
  V1  y accumulated in a VMEM scratch, written out on the LAST step only
  V2  V1 + xg built once per slot into a scratch then dotted (copy test)

Run on the TPU: python benchmarks/proto_r5_spmm3.py
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
    _slot_dot, patch_device_arrays, patch_spmm, _rows_c, _rows_r)
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


def kern_scratch(cc_ref, rs_ref, mk_ref, x_ref, v_ref, y_ref, acc_ref,
                 *, G, KC_, MP, steps, prec, stage_xg):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for g in range(G):
        b = s * G + g
        parts = [x_ref[pl.ds(cc_ref[b, j] * CC, CC), :] for j in range(KC_)]
        xg = jnp.concatenate(parts, axis=0)
        yp = _slot_dot(v_ref[g], xg, prec)
        acc_ref[pl.ds(rs_ref[b], MP), :] += yp

    @pl.when(s == steps - 1)
    def _():
        y_ref[:] = acc_ref[:]


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

    plans = [build_patch_plan(Ai._layout, force_canvas=(64, 4), force_G=32)
             for Ai in As]
    plan = plans[0]
    b = plan.buckets[0]
    devs = [patch_device_arrays(p) for p in plans]
    G, MP, KP = b.G, b.MP, b.KP
    KC_ = KP // CC
    steps = b.nb // G

    # V0 reference on the same plan
    def apply0(i, X):
        return patch_spmm(plan, devs[i], X, precision="highest")
    out = np.asarray(apply0(0, Xo))
    assert np.max(np.abs(out - Yo)) / np.max(np.abs(Yo)) < 1e-5
    measure(apply0, n, "V0 shipped", roof_us)

    # V1 scratch accumulator
    rows_c, rows_r = _rows_c(plan), _rows_r(plan)
    xrows, yrows = rows_c, rows_r
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((xrows, R), lambda s, c, r, m: (0, 0)),
            pl.BlockSpec((G, MP, KP), lambda s, c, r, m: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((yrows, R), lambda s, c, r, m: (0, 0)),
        scratch_shapes=[pltpu.VMEM((yrows, R), jnp.float32)],
    )
    call = pl.pallas_call(
        functools.partial(kern_scratch, G=G, KC_=KC_, MP=MP, steps=steps,
                          prec="highest", stage_xg=False),
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
        y = call(cc, rs, mk, Xp, vals)
        return y[:n]

    out = np.asarray(apply1(0, Xo))
    err = np.max(np.abs(out - Yo)) / np.max(np.abs(Yo))
    print(f"  V1 relerr {err:.2e}", flush=True)
    assert err < 1e-5
    measure(apply1, n, "V1 scratch-acc", roof_us)


if __name__ == "__main__":
    main()
