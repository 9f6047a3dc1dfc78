"""SpMV formulation experiment: einsum precisions vs VPU multiply-reduce.

Run alone on an idle machine (see docs/performance.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.abspath(".jax_cache_tpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from blocksparse_tpu.utils.timing import chained_time_per_iter

    rng = np.random.default_rng(7)
    nb, bs, n = 2000, 128, 8192
    vals = jnp.asarray(rng.standard_normal((nb, bs, bs)).astype(np.float32))
    cidx = jnp.asarray(rng.integers(0, n, (nb, bs)).astype(np.int32))
    ridx = jnp.asarray(rng.integers(0, n, (nb, bs)).astype(np.int32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    bytes_per = nb * bs * bs * 4

    def spmv_einsum(v, precision):
        xg = v[cidx]
        yp = jnp.einsum("bmk,bk->bm", vals, xg, precision=precision)
        return jnp.zeros(n, jnp.float32).at[ridx.reshape(-1)].add(yp.reshape(-1))

    def spmv_vpu(v):
        xg = v[cidx]  # [nb, bs]
        yp = jnp.sum(vals * xg[:, None, :], axis=-1)  # exact f32 on VPU
        return jnp.zeros(n, jnp.float32).at[ridx.reshape(-1)].add(yp.reshape(-1))

    variants = [
        ("einsum_default", lambda v: spmv_einsum(v, None) * 0.01),
        ("einsum_highest", lambda v: spmv_einsum(v, "highest") * 0.01),
        ("vpu_mul_reduce", lambda v: spmv_vpu(v) * 0.01),
    ]
    for name, fn in variants:
        t0 = time.time()
        dt = chained_time_per_iter(fn, x, iters_lo=5, iters_hi=25, repeats=2)
        print(
            f"{name}: {dt*1e6:.1f} us, {bytes_per/dt/1e9:.0f} GB/s "
            f"({100*bytes_per/dt/819e9:.1f}% roofline) [wall {time.time()-t0:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
