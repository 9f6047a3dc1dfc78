"""Round-4 probe: config4 SpMM grid-step sweep at fixed canvases.

The canvas sweep (proto_r4_spmm.py) showed (64,8) at 14.3 us beating the
cost-model default (64,4) at 15.9 us, with stream and MXU time looking
ADDITIVE (~10.9 us stream + ~9.2 us HIGHEST MXU at ratio 1.44 vs 14.3
measured).  Pallas pipelines the [G, MP, KP] value blocks across grid
steps, so more steps (smaller G) should hide the stream behind compute
up to max(stream, mxu) + stream/steps.  Sweep G at the two best
canvases, dep-chained and piped.

Run: python benchmarks/proto_r4_spmmG.py
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
PIPE = 4


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    A = bench.build_config1()
    n = A.shape[0]
    nnz = A.nnz
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    Xp = jnp.asarray(rng.standard_normal((n, R * PIPE)).astype(np.float32))
    ref = np.asarray(A @ X)
    roof = (nnz * 4 + 2 * n * R * 4) / BW * 1e6

    for canvas in ((64, 8), (64, 4)):
        for G in (8, 16, 24, 40):
            plan = build_patch_plan(A._layout, force_canvas=canvas, force_G=G)
            if plan is None:
                continue
            b = plan.buckets[0]
            if b.nb % b.G:
                continue
            dev = patch_device_arrays(plan)
            y = np.asarray(patch_spmm(plan, dev, X))
            err = np.abs(y - ref).max() / max(1.0, np.abs(ref).max())
            st = chained_time_per_iter(
                lambda V: patch_spmm(plan, dev, V) * 1e-3, X,
                iters_lo=5, iters_hi=25, repeats=5, reduce="stats")
            us = st["median"] * 1e6

            def piped(Xc):
                parts = [patch_spmm(plan, dev, Xc[:, i * R:(i + 1) * R])
                         for i in range(PIPE)]
                return jnp.concatenate(parts, axis=1) * 1e-3

            sp = chained_time_per_iter(piped, Xp, iters_lo=3, iters_hi=10,
                                       repeats=5, reduce="stats")
            pus = sp["median"] * 1e6 / PIPE
            print(f"canvas {canvas} G={b.G:3d} steps={b.nb//b.G:2d} "
                  f"nb={b.nb} ratio={plan.padded_nnz/nnz:.2f}: "
                  f"dep {us:.1f} us ({100*roof/us:.1f}%) | "
                  f"piped {pus:.1f} us ({100*roof/pus:.1f}%) err={err:.1e}",
                  flush=True)


if __name__ == "__main__":
    main()
