"""Round-4 probe: config1 r=1 latency via SINGLE-bucket patch plans.

The shipped XLA engine splits config1 into 3 k-merge buckets -> ~9-op
dep chain = 7.1 us (proto_r4_dep.py).  A patch plan is ONE canvas: the
chain shrinks to gather->einsum->scatter (XLA path) or gather->kernel->
scatter (r=1 mono-kernel).  Sweep canvas/G for both, dep and piped.

Run: python benchmarks/proto_r4_dep2.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               "..", ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from blocksparse_tpu.core.patch import build_patch_plan  # noqa: E402
from blocksparse_tpu.ops.patch_engine import (  # noqa: E402
    patch_device_arrays, patch_kernel_ok, patch_spmv, patch_spmv_kernel)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9
PIPE = 4


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    A = bench.build_config1()
    n = A.shape[0]
    nnz = A.nnz
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    Xp = jnp.asarray(rng.standard_normal((n, PIPE)).astype(np.float32))
    ref = np.asarray(A @ x)
    roof = (nnz * 4 + 2 * n * 4) / BW * 1e6

    for canvas, G in (((64, 4), 16), ((64, 4), 8), ((64, 4), 40),
                      ((64, 8), 8), ((64, 8), 24), ((128, 4), 16)):
        plan = build_patch_plan(A._layout, force_canvas=canvas, force_G=G)
        if plan is None:
            print(f"canvas {canvas}: no plan")
            continue
        dev = patch_device_arrays(plan)
        paths = [("xla", lambda v: patch_spmv(plan, dev, v))]
        if patch_kernel_ok(plan):
            paths.append(("kern", lambda v: patch_spmv_kernel(plan, dev, v)))
        for pname, ap in paths:
            y = np.asarray(ap(x))
            err = np.abs(y - ref).max() / np.abs(ref).max()
            st = chained_time_per_iter(lambda v: ap(v) * 1e-3, x,
                                       iters_lo=10, iters_hi=60, repeats=5,
                                       reduce="stats")
            us = st["median"] * 1e6

            def piped(Xc, ap=ap):
                cols = [ap(Xc[:, i]) for i in range(PIPE)]
                return jnp.stack(cols, axis=1) * 1e-3

            sp = chained_time_per_iter(piped, Xp, iters_lo=5, iters_hi=30,
                                       repeats=5, reduce="stats")
            pus = sp["median"] * 1e6 / PIPE
            b = plan.buckets[0]
            print(f"[{pname}] canvas {canvas} G={b.G} nb={b.nb} "
                  f"ratio={plan.padded_nnz/nnz:.2f}: dep {us:.1f} us "
                  f"({100*roof/us:.1f}%) | piped {pus:.1f} us "
                  f"({100*roof/pus:.1f}%) err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
