"""Config1 pipelined-throughput probe: the real engine, 4 independent
products per chain body (different x; vals re-read per product -- no CSE).

Also sweeps layout variants (k-merged pow2 vs exact single-bucket).

python -u benchmarks/proto_c1d.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    import blocksparse_tpu as bst

    rng = np.random.default_rng(7)
    n, nb, bs = 4096, 200, 64
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nb, replace=False)
    rows = (pos // ntiles) * bs
    cols = (pos % ntiles) * bs
    blocks = [rng.standard_normal((bs, bs)).astype(np.float32)
              for _ in range(nb)]
    bytes_min = nb * bs * bs * 4 + 2 * n * 4
    roof = bytes_min / BW
    print(f"roofline {roof*1e6:.2f} us")

    P = 4  # independent products per body
    X = jnp.asarray(rng.standard_normal((n, P)).astype(np.float32))

    for name, kw in (
        ("pow2 k-merged (default)", {}),
        ("exact (64,64), no merge", dict(granularity=(64, 64))),
    ):
        A = bst.BlockSparseMatrix(
            blocks,
            [np.arange(r, r + bs) for r in rows],
            [np.arange(c, c + bs) for c in cols], (n, n), **kw)

        def dep(v):
            return (A @ v) * (1 + 1e-20)

        def piped(Xc):
            cols_out = [A @ Xc[:, i] for i in range(P)]
            return jnp.stack(cols_out, axis=1) * (1 + 1e-20)

        d1 = chained_time_per_iter(dep, X[:, 0], iters_lo=10, iters_hi=60,
                                   repeats=5, reduce="min")
        dp = chained_time_per_iter(piped, X, iters_lo=5, iters_hi=25,
                                   repeats=5, reduce="min")
        print(f"{name:28s} dep: {d1*1e6:6.2f} us ({100*roof/d1:5.1f}%)   "
              f"piped/4: {dp/P*1e6:6.2f} us ({100*roof/(dp/P):5.1f}%)")


if __name__ == "__main__":
    main()
