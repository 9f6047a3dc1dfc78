"""Round-5 probe: attack the fused mirror kernel's 0.49-of-wire rate.

Hypothesis (VERDICT r4 weak #1): the mirror side's
``V * xr[:, :, None]`` forces a lane->sublane relayout of xr per tile
plus an axis-1 sublane reduction; both are VPU-hostile.  Variants keep
the forward side identical and recompute the mirror contribution as
lane-aligned FMAs:

  A  baseline _pkern_mirror (3-D broadcast + axis-1 reduce)
  B  xrb = xr @ kron(I8, ones(1,128)) one MXU dot -> [TS, 1024];
     yt = sum_m V[:,m,:] * xrb[:, 128m:128(m+1)]   (static lane slices)
  C  per-m tiny MXU dots xr @ B_m -> [TS, 128]; same FMA accumulate
  D  per-m lane slice xr[:, m:m+1] broadcast (no MXU)
  E  forward only (mirror dropped) -- rate ceiling for the fused stream

Run on the TPU: python benchmarks/proto_r5_mirror.py
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

from blocksparse_tpu.core.panel import (  # noqa: E402
    _best_shift_variant, _layout_entries)
from blocksparse_tpu.core.strip import CC, RC  # noqa: E402
from blocksparse_tpu.ops.pallas.panel_spmv import (  # noqa: E402
    _dg0, _gather_xs, _onehots, panel_device_arrays)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9


def _iota_B():
    """kron(I8, ones(1,128)) built in-kernel (no captured constants)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (RC, RC * CC), 1) // CC
            == jax.lax.broadcasted_iota(jnp.int32, (RC, RC * CC), 0)
            ).astype(jnp.float32)


def _iota_Bm(m):
    return (jax.lax.broadcasted_iota(jnp.int32, (RC, CC), 0)
            == m).astype(jnp.float32)


def _split3(a):
    """Exact 3-plane bf16 decomposition of f32 (hi+mid+lo == a)."""
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot3oh(oh, a, contract0=False):
    """One-hot (exact in bf16) x f32 via 3 single-pass bf16 dots --
    exact like HIGHEST at half the MXU passes."""
    ohb = oh.astype(jnp.bfloat16)
    out = None
    for plane in _split3(a):
        if contract0:
            p = jax.lax.dot_general(
                ohb, plane, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            p = jnp.dot(ohb, plane, preferred_element_type=jnp.float32)
        out = p if out is None else out + p
    return out


def make_kern(variant, RW, CW):
    def kern(b8_ref, xs_ref, x8_ref, vals_ref, rid_ref, cid_ref,
             y8_ref, ym_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y8_ref[:] = jnp.zeros_like(y8_ref)

        V = vals_ref[:]
        R, CT = _onehots(rid_ref, cid_ref, RW, CW)
        base = b8_ref[s]
        if variant == "F":
            # all four one-hot dots as exact 3-pass splits
            xg = _dot3oh(CT, xs_ref[0], contract0=True)
            yf = jnp.sum(V * xg[:, None, :], axis=2)
            y8_ref[pl.ds(base, RW), :] += _dot3oh(R, yf)
            xw = x8_ref[pl.ds(base, RW), :]
            xr = _dot3oh(R, xw, contract0=True)
            yt = jnp.sum(V * xr[:, :, None], axis=1)
            ym_ref[0] = _dot3oh(CT, yt)
            return
        xg = _dg0(CT, xs_ref[0])
        yf = jnp.sum(V * xg[:, None, :], axis=2)
        y8_ref[pl.ds(base, RW), :] += jnp.dot(
            R, yf, preferred_element_type=jnp.float32, precision=HI)
        if variant == "E":
            ym_ref[0] = jnp.zeros_like(ym_ref[0])
            return
        xw = x8_ref[pl.ds(base, RW), :]
        xr = _dg0(R, xw)                                # [TS, 8]
        if variant == "A":
            yt = jnp.sum(V * xr[:, :, None], axis=1)
        elif variant == "B":
            xrb = jnp.dot(xr, _iota_B(),
                          preferred_element_type=jnp.float32,
                          precision=HI)                 # [TS, 8*128]
            yt = V[:, 0, :] * xrb[:, 0:CC]
            for m in range(1, RC):
                yt = yt + V[:, m, :] * xrb[:, m * CC:(m + 1) * CC]
        elif variant == "C":
            yt = None
            for m in range(RC):
                xrb_m = jnp.dot(xr, _iota_Bm(m),
                                preferred_element_type=jnp.float32,
                                precision=HI)           # [TS, 128]
                t = V[:, m, :] * xrb_m
                yt = t if yt is None else yt + t
        else:  # D
            yt = None
            for m in range(RC):
                t = V[:, m, :] * xr[:, m:m + 1]
                yt = t if yt is None else yt + t
        ym_ref[0] = jnp.dot(CT, yt, preferred_element_type=jnp.float32,
                            precision=HI)
    return kern


def main():
    import bench

    S_op = bench.build_config2()
    dlay, olay = S_op._dlayout, S_op._olayout
    shape = (dlay.nrows, dlay.ncols)
    diag = _layout_entries(dlay, transpose=False)
    off = _layout_entries(olay, transpose=False)
    plan = _best_shift_variant(
        diag + [(b, r, c, True) for b, r, c, _ in off], shape,
        mirror=True, TS_max=1024)
    assert plan is not None and plan.mirror
    dev = panel_device_arrays(plan)
    vals, rid8, cid8, segid, b8, omap = dev
    S, TS, CW, RW, n8p = plan.S, plan.TS, plan.CW, plan.RW, plan.n8p
    NC32 = plan.NC32
    logical = S_op._dlayout.nnz + S_op._olayout.nnz
    wire = (plan.tile_bytes + plan.aux_bytes) / BW * 1e6
    log_us = logical * 4 / BW * 1e6
    print(f"plan: S={S} TS={TS} CW={CW} RW={RW} stream/logical="
          f"{plan.tile_bytes / (logical * 4):.2f} wire={wire:.1f} us "
          f"logical-roofline={log_us:.1f} us", flush=True)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(plan.ncols).astype(np.float32))
    xs0 = _gather_xs(x, segid, S, CW, NC32, plan.ncols, plan.grids_used)
    x8pad = n8p * RC - plan.nrows
    xf = jnp.pad(x, (0, x8pad)) if x8pad else x
    x8 = xf.reshape(n8p, RC)

    ref = None
    for variant in ("A", "F"):
        kern = make_kern(variant, RW, CW)
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

        @jax.jit
        def product(xin):
            xs = _gather_xs(xin, segid, S, CW, NC32, plan.ncols,
                            plan.grids_used)
            x8pad_ = n8p * RC - plan.nrows
            x8_ = (jnp.pad(xin, (0, x8pad_)) if x8pad_ else xin
                   ).reshape(n8p, RC)
            y8, ym = call(b8, xs, x8_, vals, rid8, cid8)
            y = y8.reshape(-1)[:plan.nrows]
            ym32 = ym.reshape(S * CW * (CC // 32), 32)
            y32 = jnp.dot(omap.astype(jnp.float32).T, ym32,
                          preferred_element_type=jnp.float32, precision=HI)
            return y + y32.reshape(-1)[:plan.nrows]

        # correctness vs scipy for full variants
        out = np.asarray(product(x))
        if variant == "A":
            import blocksparse_tpu as bst
            ref = np.asarray(S_op @ x)
            err = np.max(np.abs(out - ref)) / max(1.0, np.max(np.abs(ref)))
            print(f"  [A] vs operator relerr {err:.2e}", flush=True)
        elif variant in ("B", "C", "D"):
            err = np.max(np.abs(out - ref)) / max(1.0, np.max(np.abs(ref)))
            assert err < 1e-5, (variant, err)

        def step(xin):
            y = product(xin)
            return xin + y * 1e-30

        st = chained_time_per_iter(step, x, iters_lo=10, iters_hi=60,
                                   repeats=5, reduce="stats")
        us = st["median"] * 1e6
        print(f"  [{variant}] {us:.1f} us  kernel-rate {100 * wire / us:.0f}% "
              f"of wire  logical {100 * log_us / us:.0f}%", flush=True)


if __name__ == "__main__":
    main()
