"""Contiguous-block operator SpMV/SpMM: backend x precision on idle TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import blocksparse_tpu as bst
    from blocksparse_tpu.utils.timing import chained_time_per_iter

    rng = np.random.default_rng(7)
    n, nb, bs = 8192, 2000, 128
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nb, replace=False)
    rows = (pos // ntiles) * bs
    cols = (pos % ntiles) * bs
    blocks = [rng.standard_normal((bs, bs)).astype(np.float32) for _ in range(nb)]
    rl = [np.arange(r, r + bs) for r in rows]
    cl = [np.arange(c, c + bs) for c in cols]
    bytes_per = nb * bs * bs * 4
    flops_per = 2 * nb * bs * bs
    x1 = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
    X = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))

    for backend in ("xla", "pallas"):
        for prec in (None, "highest"):
            A = bst.BlockSparseMatrix(
                blocks, rl, cl, (n, n), backend=backend, precision=prec
            )
            t0 = time.time()
            dt = chained_time_per_iter(
                lambda v: (A @ v) * 0.01, x1, iters_lo=5, iters_hi=25, repeats=2
            )
            print(
                f"spmv {backend} prec={prec}: {dt*1e6:.1f} us, "
                f"{bytes_per/dt/1e9:.0f} GB/s ({100*bytes_per/dt/819e9:.1f}%) "
                f"[wall {time.time()-t0:.0f}s]",
                flush=True,
            )
            t0 = time.time()
            dtm = chained_time_per_iter(
                lambda v: (A @ v) * 0.01, X, iters_lo=5, iters_hi=25, repeats=2
            )
            print(
                f"spmm r=128 {backend} prec={prec}: {dtm*1e6:.1f} us, "
                f"{flops_per*128/dtm/1e12:.2f} TFLOP/s [wall {time.time()-t0:.0f}s]",
                flush=True,
            )


if __name__ == "__main__":
    main()
