"""Round-3 probe: patch engine on the real BASELINE configs (TPU).

config2 (symmetric fused), config3 (VBCRS mixed), config4 (SpMM on config1's
matrix) through core/patch + ops/patch_engine, reported against LOGICAL
rooflines.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import importlib
bench = importlib.import_module("bench")
from blocksparse_tpu.core.patch import build_patch_plan
from blocksparse_tpu.ops.patch_engine import (
    patch_device_arrays, patch_spmm, patch_spmv)
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9


def t_chain(step, x0, iters=(20, 100)):
    return chained_time_per_iter(step, x0, iters_lo=iters[0],
                                 iters_hi=iters[1], repeats=5, reduce="stats")


def report(name, st, logical_bytes, streamed):
    roof = logical_bytes / BW
    print(f"{name}: {st['min']*1e6:.1f}/{st['median']*1e6:.1f} us = "
          f"{100*roof/st['median']:.1f}% of LOGICAL roofline "
          f"(streamed {streamed/1e6:.1f} MB vs logical "
          f"{logical_bytes/1e6:.1f} MB, eta "
          f"{100*streamed/st['median']/BW:.0f}%)")


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # -- config2 symmetric ----------------------------------------------------
    S = bench.build_config2()
    n = S.shape[0]
    plan2 = build_patch_plan(S._dlayout, extra_layout=S._olayout)
    assert plan2 is not None
    dev2 = patch_device_arrays(plan2)
    # reference nnz semantics: diag once + off-diag twice
    # (symmetricblockmatrix.jl:367-384) -- that is S.nnz
    logical2 = S.nnz * 4 + 2 * n * 4
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    st = t_chain(lambda v: patch_spmv(plan2, dev2, v) * 1e-3, x)
    streamed = plan2.value_bytes + plan2.aux_bytes
    print(f"# plan2: stored-padded/stored-logical = "
          f"{plan2.padded_nnz/plan2.logical_nnz:.2f}, buckets = "
          f"{[(b.nb, b.MP, b.KP) for b in plan2.buckets]}")
    report("config2 patch fused spmv", st, logical2, streamed)
    # correctness vs the format's own product
    y_fmt = np.asarray(S @ x)
    y_pt = np.asarray(patch_spmv(plan2, dev2, x))
    print(f"  vs format: rel {np.abs(y_fmt-y_pt).max()/np.abs(y_fmt).max():.2e}")

    # -- config3 VBCRS --------------------------------------------------------
    V = bench.build_config3()
    plan3 = build_patch_plan(V.layout)
    assert plan3 is not None
    dev3 = patch_device_arrays(plan3)
    n3 = V.shape[1]
    logical3 = V.nnz * 4 + 2 * n3 * 4
    xv = jnp.asarray(rng.standard_normal(n3).astype(np.float32))
    st = t_chain(lambda v: patch_spmv(plan3, dev3, v) * 1e-3, xv)
    streamed3 = plan3.value_bytes + plan3.aux_bytes
    print(f"# plan3: padded/logical = "
          f"{plan3.padded_nnz/plan3.logical_nnz:.2f}, buckets = "
          f"{[(b.nb, b.MP, b.KP) for b in plan3.buckets]}")
    report("config3 patch spmv", st, logical3, streamed3)
    y_fmt = np.asarray(V @ xv)
    y_pt = np.asarray(patch_spmv(plan3, dev3, xv))
    print(f"  vs format: rel {np.abs(y_fmt-y_pt).max()/np.abs(y_fmt).max():.2e}")

    # -- config4 SpMM on config1 ----------------------------------------------
    A = bench.build_config1()
    plan1 = build_patch_plan(A.layout)
    assert plan1 is not None
    dev1 = patch_device_arrays(plan1)
    n1 = A.shape[0]
    r = 128
    X = jnp.asarray(rng.standard_normal((n1, r)).astype(np.float32))
    logical4 = A.nnz * 4 + 2 * n1 * r * 4
    st = t_chain(lambda Vv: patch_spmm(plan1, dev1, Vv) * 1e-3, X,
                 iters=(10, 50))
    streamed4 = plan1.value_bytes + 2 * n1 * r * 4
    print(f"# plan1: padded/logical = "
          f"{plan1.padded_nnz/plan1.logical_nnz:.2f}, buckets = "
          f"{[(b.nb, b.MP, b.KP, b.G) for b in plan1.buckets]}")
    report("config4 patch mono-kernel spmm", st, logical4, streamed4)
    print(f"  TFLOP/s: {2*A.nnz*r/st['median']/1e12:.2f}")
    Y_fmt = np.asarray(A @ X)
    Y_pt = np.asarray(patch_spmm(plan1, dev1, X))
    print(f"  vs format: rel {np.abs(Y_fmt-Y_pt).max()/np.abs(Y_fmt).max():.2e}")

    # config1 spmv via patch (cold-latency candidate)
    x1 = jnp.asarray(rng.standard_normal(n1).astype(np.float32))
    st = t_chain(lambda v: patch_spmv(plan1, dev1, v) * 1e-3, x1)
    logical1 = A.nnz * 4 + 2 * n1 * 4
    report("config1 patch spmv", st, logical1,
           plan1.value_bytes + plan1.aux_bytes)


if __name__ == "__main__":
    main()
