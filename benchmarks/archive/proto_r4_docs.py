"""Round-4: re-measure every number cited in docs/performance.md.

  (a) config4 precision tiers (highest / high / None): dep-chain SpMM
      r=128 on the BASELINE config-1 population.
  (b) large contiguous fixture 2000x128x128 f32 (131 MB), n=8192:
      SpMV GB/s (auto engine) and SpMM r=128 TFLOP/s (auto = fused
      Pallas), plus the element-engine SpMV for the contrast row.

Run: python benchmarks/proto_r4_docs.py [a|b]
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


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    which = sys.argv[1] if len(sys.argv) > 1 else "a"
    rng = np.random.default_rng(0)

    if which == "a":
        A0 = bench.build_config1()
        n = A0.shape[0]
        nnz = A0.nnz
        R = 128
        X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
        roof = (nnz * 4 + 2 * n * R * 4) / BW * 1e6
        ref = None
        for prec in ("highest", "high", None):
            A = bench.build_config1(precision=prec)
            y = np.asarray(A @ X)
            if ref is None:
                ref = y
            err = np.abs(y - ref).max() / np.abs(ref).max()
            st = chained_time_per_iter(
                lambda V: (A @ V) * 1e-3, X, iters_lo=5, iters_hi=25,
                repeats=7, reduce="stats")
            us = st["median"] * 1e6
            print(f"precision={prec!s:8s}: dep {us:.1f} us = "
                  f"{100*roof/us:.1f}% roofline, "
                  f"{2*nnz*R/us/1e6:.2f} TFLOP/s, rel err vs highest "
                  f"{err:.1e}", flush=True)
        return

    # (b) large contiguous fixture
    import blocksparse_tpu as bst

    # canonical fixture (benchmarks/contiguous_precision.py): 128-ALIGNED
    rng = np.random.default_rng(7)
    n, nb, bs = 8192, 2000, 128
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nb, replace=False)
    blocks = [rng.standard_normal((bs, bs)).astype(np.float32)
              for _ in range(nb)]
    rows = [np.arange(r, r + bs) for r in (pos // ntiles) * bs]
    cols = [np.arange(c, c + bs) for c in (pos % ntiles) * bs]
    A = bst.BlockSparseMatrix(blocks, rows, cols, (n, n))
    nnz = A.nnz
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    st = chained_time_per_iter(lambda v: (A @ v) * 1e-3, x,
                               iters_lo=3, iters_hi=10, repeats=5,
                               reduce="stats")
    us = st["median"] * 1e6
    gbs = (nnz * 4 + 2 * n * 4) / (us * 1e-6) / 1e9
    print(f"2000x128x128 SpMV auto: {us:.0f} us = {gbs:.0f} GB/s "
          f"({100*gbs*1e9/BW:.0f}% roofline)", flush=True)
    R = 128
    X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    stm = chained_time_per_iter(lambda V: (A @ V) * 1e-3, X,
                                iters_lo=3, iters_hi=8, repeats=5,
                                reduce="stats")
    usm = stm["median"] * 1e6
    print(f"2000x128x128 SpMM r=128 auto: {usm:.0f} us = "
          f"{2*nnz*R/usm/1e6:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
