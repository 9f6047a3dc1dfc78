"""r=1 contraction-strategy sweep for the patch mono-kernel (TPU).

The first r=1 kernel (VPU broadcast-multiply + jnp.sum reductions) measured
compute-bound: 39-74% vals-stream efficiency (proto_r3_k1.py).  Per-slot
cross-lane reduction trees cost ~(MP/8)*(KP/128+7) VPU ops vs the multiply's
(MP*KP/1024), a ~3x overhead at KP=512.  Variants:

  vpu     : current kernel (baseline)
  dot     : per-slot jnp.dot on the MXU (V @ xg[:,None], xr[None,:] @ V)
  ones    : multiply then MXU contraction with an all-ones vector
  spmm1   : the existing SpMM mono-kernel with R=1 (x VMEM-resident,
            scalar-prefetched chunk gathers, MXU dots)
  xla     : patch_spmv one-hot XLA engine (einsum lowering)
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import importlib
bench = importlib.import_module("bench")
from blocksparse_tpu.core.patch import CC, CR, build_patch_plan
from blocksparse_tpu.ops.patch_engine import (
    HI, _pad_to, patch_device_arrays, patch_spmv, patch_spmm, patch_spmv_kernel)
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9
rng = np.random.default_rng(0)


def kern_var(xg_ref, xr_ref, v_ref, yf_ref, yt_ref, *, G, style, mirror):
    ones = None
    for g in range(G):
        V = v_ref[g]
        if style == "vpu":
            yf_ref[g, :] = jnp.sum(V * xg_ref[g, :][None, :], axis=1)
            if mirror:
                yt_ref[g, :] = jnp.sum(V * xr_ref[g, :][:, None], axis=0)
        elif style == "dot":
            yf_ref[g, :] = jnp.dot(
                V, xg_ref[g, :][:, None], preferred_element_type=jnp.float32,
                precision=HI)[:, 0]
            if mirror:
                yt_ref[g, :] = jnp.dot(
                    xr_ref[g, :][None, :], V,
                    preferred_element_type=jnp.float32, precision=HI)[0, :]
        elif style == "ones":
            if ones is None:
                ones = jnp.ones((V.shape[1], 1), jnp.float32)
            P = V * xg_ref[g, :][None, :]
            yf_ref[g, :] = jnp.dot(P, ones,
                                   preferred_element_type=jnp.float32,
                                   precision=HI)[:, 0]
            if mirror:
                Q = V * xr_ref[g, :][:, None]
                yt_ref[g, :] = jnp.dot(
                    jnp.ones((1, V.shape[0]), jnp.float32), Q,
                    preferred_element_type=jnp.float32, precision=HI)[0, :]


def run_variant(plan, dev, x, style):
    (vals, gOH, sOH, flag, _cc, _rs, _mk) = dev[0]
    nb, MP, KP = vals.shape
    b = plan.buckets[0]
    G = b.G
    steps = nb // G
    NC, NR = plan.NC, plan.NR
    mirror = plan.symmetric

    def f(x):
        x32 = _pad_to(x, (NC + 1) * CC).reshape(NC + 1, CC)
        xg = jnp.dot(gOH, x32, preferred_element_type=jnp.float32,
                     precision=HI).reshape(nb, KP)
        x8 = _pad_to(x, (NR + 1) * CR).reshape(NR + 1, CR)
        xr = jnp.dot(sOH, x8, preferred_element_type=jnp.float32,
                     precision=HI).reshape(nb, MP)
        sl = lambda s: (s, 0)
        outs = pl.pallas_call(
            functools.partial(kern_var, G=G, style=style, mirror=mirror),
            grid=(steps,),
            in_specs=[pl.BlockSpec((G, KP), sl), pl.BlockSpec((G, MP), sl),
                      pl.BlockSpec((G, MP, KP), lambda s: (s, 0, 0))],
            out_specs=[pl.BlockSpec((G, MP), sl), pl.BlockSpec((G, KP), sl)],
            out_shape=[jax.ShapeDtypeStruct((nb, MP), jnp.float32),
                       jax.ShapeDtypeStruct((nb, KP), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=4 * vals.size, bytes_accessed=vals.size * 4,
                transcendentals=0),
        )(xg, xr, vals)
        yf, yt = outs
        y = jnp.dot(sOH.T, yf.reshape(-1, CR),
                    preferred_element_type=jnp.float32,
                    precision=HI).reshape(-1)[:plan.nrows]
        if mirror:
            ytm = yt * jnp.repeat(flag, CC, axis=1)
            y = y + jnp.dot(gOH.T, ytm.reshape(-1, CC),
                            preferred_element_type=jnp.float32,
                            precision=HI).reshape(-1)[:plan.nrows]
        return y

    return f


def measure(tag, plan, dev, x, logical, oracle, style):
    if style == "spmm1":
        fn = lambda v: patch_spmm(plan, dev, v[:, None])[:, 0]
    elif style == "xla":
        fn = lambda v: patch_spmv(plan, dev, v)
    else:
        fn = run_variant(plan, dev, x, style)
    y = np.asarray(fn(x))
    err = np.abs(y - oracle).max() / np.abs(oracle).max()
    st = chained_time_per_iter(lambda v: fn(v) * 1e-3, x, iters_lo=10,
                               iters_hi=50, repeats=3, reduce="stats")
    vb = plan.value_bytes
    print(f"{tag} {style:6s}: {st['min']*1e6:6.1f}/{st['median']*1e6:6.1f} us"
          f" = {100*(logical/BW)/st['median']:5.1f}% logical "
          f"(vals eta {100*vb/st['median']/BW:3.0f}%, err {err:.1e})",
          flush=True)


A = bench.build_config1()
S = bench.build_config2()
x1 = jnp.asarray(rng.standard_normal(A.shape[1]).astype(np.float32))
x2 = jnp.asarray(rng.standard_normal(S.shape[0]).astype(np.float32))
o1 = np.asarray(A @ x1)
o2 = np.asarray(S @ x2)
log1 = A.nnz * 4 + 2 * A.shape[0] * 4
log2 = (S._dlayout.nnz + S._olayout.nnz) * 4 + 2 * S.shape[0] * 4

p1 = build_patch_plan(A.layout, force_canvas=(64, 4))
d1 = patch_device_arrays(p1)
p2 = build_patch_plan(S._dlayout, extra_layout=S._olayout,
                      force_canvas=(32, 8))
d2 = patch_device_arrays(p2)

for style in ("vpu", "dot", "ones", "spmm1", "xla"):
    measure("c1", p1, d1, x1, log1, o1, style)
print(flush=True)
for style in ("vpu", "dot", "ones", "spmm1", "xla"):
    measure("c2", p2, d2, x2, log2, o2, style)
