"""Backend sweep: pallas vs xla across SpMV/SpMM configs (TPU).

Writes one line per config to stdout; run under the axon TPU backend.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

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
    for backend in ("pallas", "xla"):
        A = bst.BlockSparseMatrix(blocks, rl, cl, (n, n), backend=backend)
        t0 = time.time()
        dt = chained_time_per_iter(
            lambda v: (A @ v) * 0.01, x1, iters_lo=5, iters_hi=25, repeats=2
        )
        print(
            f"spmv {backend}: {dt*1e6:.1f} us, {bytes_per/dt/1e9:.0f} GB/s "
            f"({100*bytes_per/dt/819e9:.1f}%) [wall {time.time()-t0:.0f}s]",
            flush=True,
        )

    for r in (64, 128, 256):
        X = jnp.asarray(rng.standard_normal((n, r)).astype(np.float32))
        for backend in ("pallas", "xla"):
            A = bst.BlockSparseMatrix(blocks, rl, cl, (n, n), backend=backend)
            t0 = time.time()
            dt = chained_time_per_iter(
                lambda v: (A @ v) * 0.01, X, iters_lo=5, iters_hi=25, repeats=2
            )
            print(
                f"spmm r={r} {backend}: {dt*1e6:.1f} us, "
                f"{flops_per*r/dt/1e12:.2f} TFLOP/s [wall {time.time()-t0:.0f}s]",
                flush=True,
            )


if __name__ == "__main__":
    main()
