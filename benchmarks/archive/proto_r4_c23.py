"""Round-4 probe: engine survey for config2 (symmetric) and config3
(VBCRS) at r=1 -- which engine is actually fastest piped/dep on chip.

Engines: shipped auto (A @ x), panel kernel, patch XLA one-hots, patch
r=1 mono-kernel (symmetric 'm' mode never measured on config2 before).

Run: python benchmarks/proto_r4_c23.py
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


def measure(name, ap, x, Xp, ref, roof):
    y = np.asarray(ap(x))
    err = np.abs(y - ref).max() / np.abs(ref).max()
    st = chained_time_per_iter(lambda v: ap(v) * 1e-3, x,
                               iters_lo=5, iters_hi=30, repeats=5,
                               reduce="stats")
    us = st["median"] * 1e6

    def piped(Xc):
        cols = [ap(Xc[:, i]) for i in range(PIPE)]
        return jnp.stack(cols, axis=1) * 1e-3

    sp = chained_time_per_iter(piped, Xp, iters_lo=3, iters_hi=15,
                               repeats=5, reduce="stats")
    pus = sp["median"] * 1e6 / PIPE
    print(f"  [{name:12s}] dep {us:5.1f} us ({100*roof/us:5.1f}%) | "
          f"piped {pus:5.1f} us ({100*roof/pus:5.1f}%) err={err:.1e}",
          flush=True)


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    rng = np.random.default_rng(0)

    # -- config2 ----------------------------------------------------------
    S = bench.build_config2()
    n = S.shape[0]
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    Xp = jnp.asarray(rng.standard_normal((n, PIPE)).astype(np.float32))
    ref = np.asarray(S @ x)
    logical = (S._dlayout.nnz + S._olayout.nnz) * 4 + 2 * n * 4
    roof = logical / BW * 1e6
    print(f"config2: logical roof {roof:.1f} us", flush=True)
    measure("auto", lambda v: S @ v, x, Xp, ref, roof)
    plan = build_patch_plan(S._dlayout, S._olayout)
    if plan is not None:
        dev = patch_device_arrays(plan)
        print(f"  patch plan: nb={plan.buckets[0].nb} "
              f"MP={plan.buckets[0].MP} KP={plan.buckets[0].KP} "
              f"G={plan.buckets[0].G} stream/logical="
              f"{(plan.value_bytes + plan.aux_bytes)/logical:.2f}",
              flush=True)
        measure("patch-xla", lambda v: patch_spmv(plan, dev, v),
                x, Xp, ref, roof)
        if patch_kernel_ok(plan):
            measure("patch-kern",
                    lambda v: patch_spmv_kernel(plan, dev, v),
                    x, Xp, ref, roof)
    else:
        print("  patch plan: None", flush=True)

    # -- config3 ----------------------------------------------------------
    V = bench.build_config3()
    n3 = V.shape[1]
    x3 = jnp.asarray(rng.standard_normal(n3).astype(np.float32))
    Xp3 = jnp.asarray(rng.standard_normal((n3, PIPE)).astype(np.float32))
    ref3 = np.asarray(V @ x3)
    logical3 = V.layout.nnz * 4 + 2 * n3 * 4
    roof3 = logical3 / BW * 1e6
    print(f"config3: logical roof {roof3:.1f} us", flush=True)
    measure("auto", lambda v: V @ v, x3, Xp3, ref3, roof3)
    plan3 = build_patch_plan(V._layout)
    if plan3 is not None:
        dev3 = patch_device_arrays(plan3)
        print(f"  patch plan: nb={plan3.buckets[0].nb} "
              f"MP={plan3.buckets[0].MP} KP={plan3.buckets[0].KP} "
              f"G={plan3.buckets[0].G} stream/logical="
              f"{(plan3.value_bytes + plan3.aux_bytes)/logical3:.2f}",
              flush=True)
        measure("patch-xla", lambda v: patch_spmv(plan3, dev3, v),
                x3, Xp3, ref3, roof3)
        if patch_kernel_ok(plan3):
            measure("patch-kern",
                    lambda v: patch_spmv_kernel(plan3, dev3, v),
                    x3, Xp3, ref3, roof3)
    else:
        print("  patch plan: None", flush=True)


if __name__ == "__main__":
    main()
