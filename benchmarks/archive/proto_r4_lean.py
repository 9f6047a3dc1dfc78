"""Round-4 probe: lean single-bucket XLA path for config1's dep chain.

The default pow2 k-merge gives config1 three buckets (kp 64/128/256) ->
~10 XLA ops per product; at ~0.3 us/op that is the 2.8 us dep-chain
overhead (XLA op floor measured in proto_r4_floor2.py).  A uniform
(64, 64) granularity produces ONE bucket -> gather/einsum/scatter only.

Run: python benchmarks/proto_r4_lean.py
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

from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9


def modes(A, x, label, roof_t):
    dep = chained_time_per_iter(
        lambda v: (A @ v) * 1e-3, x, iters_lo=10, iters_hi=60, repeats=7,
        reduce="stats")
    PIPE = 4
    n = x.shape[0]
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.standard_normal((n, PIPE)).astype(np.float32))

    def piped(Xc):
        cols = [A @ Xc[:, i] for i in range(PIPE)]
        return jnp.stack(cols, axis=1) * 1e-3

    pip = chained_time_per_iter(piped, X, iters_lo=5, iters_hi=30,
                                repeats=7, reduce="stats")
    d, p = dep["median"] * 1e6, pip["median"] / PIPE * 1e6
    print(f"[{label}] dep {d:.2f} us ({100*roof_t/d:.1f}%) | piped/prod "
          f"{p:.2f} us ({100*roof_t/p:.1f}%)", flush=True)


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench
    import blocksparse_tpu as bst

    rng = np.random.default_rng(0)
    for gran, label in (("pow2", "pow2 (3 buckets)"),
                        ((64, 64), "uniform (64,64)"),
                        ((64, 128), "uniform (64,128)")):
        A = bench.build_config1(granularity=gran, backend="xla")
        print(f"{label}: buckets="
              f"{[(b.nblocks, b.mp, b.kp) for b in A._layout.buckets]}",
              flush=True)
        n = A.shape[0]
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        S = bst.to_scipy(A)
        err = np.abs(np.asarray(A @ x) - S @ np.asarray(x)).max()
        roof_t = (A.nnz * 4 + 2 * n * 4) / BW * 1e6
        print(f"  err={err:.2e}")
        modes(A, x, label, roof_t)


if __name__ == "__main__":
    main()
