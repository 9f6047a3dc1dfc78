"""Round-4 probe: config4 SpMM canvas sweep (real TPU).

The shipped patch plan for config1 picks canvas (MP=64, KC=4) -> per-slot
MXU matmuls [64,128]@[128,128], measured ~62% MXU utilization at HIGHEST.
Sweep forced canvases (wider K amortizes pipeline fill) and grid group
sizes, timing the full patch_spmm r=128 dep-chained.

Run: python benchmarks/proto_r4_spmm.py
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
    patch_device_arrays, patch_spmm)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9
R = 128


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    A = bench.build_config1()
    n = A.shape[0]
    nnz = A.nnz
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    ref = np.asarray(A @ X)
    roof = (nnz * 4 + 2 * n * R * 4) / BW * 1e6

    for canvas in (None, (64, 8), (64, 16), (64, 32), (64, 64), (128, 16)):
        plan = build_patch_plan(A._layout, force_canvas=canvas)
        if plan is None:
            print(f"canvas {canvas}: no plan")
            continue
        dev = patch_device_arrays(plan)
        y = np.asarray(patch_spmm(plan, dev, X))
        err = np.abs(y - ref).max() / max(1.0, np.abs(ref).max())
        st = chained_time_per_iter(
            lambda V: patch_spmm(plan, dev, V) * 1e-3, X,
            iters_lo=5, iters_hi=25, repeats=5, reduce="stats")
        us = st["median"] * 1e6
        b = plan.buckets[0]
        mac = plan.padded_nnz * R
        print(f"canvas {canvas} -> MP={b.MP} KP={b.KP} nb={b.nb} G={b.G} "
              f"ratio={plan.padded_nnz/nnz:.2f}: {us:.1f} us = "
              f"{100*roof/us:.1f}% roofline, "
              f"{2*nnz*R/us/1e6:.1f} GFLOP/ms logical, "
              f"MXU {mac*6/us/1e3/0.94:.1f}K MAC-pass/cyc, err={err:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
