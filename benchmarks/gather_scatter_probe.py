"""Isolate the cost of gather / GEMM / scatter in the scattered-index SpMV.

Variants (same 2000x128x128 f32 workload, random indices):
  full          gather + einsum + scatter-add      (the real SpMV)
  no_scatter    gather + einsum, reduce instead of scatter
  no_gather     einsum on a fixed x tile + scatter-add
  gemm_only     einsum only
  sorted_scatter gather + einsum + permuted sorted segment-sum scatter
  mask_gather   mask-select Pallas gather + einsum + XLA scatter
  mask_full     mask-select Pallas gather AND scatter (VERDICT #3 kernel)
"""

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

    from blocksparse_tpu.utils.timing import chained_time_per_iter

    rng = np.random.default_rng(7)
    nb, bs, n = 2000, 128, 8192
    vals = jnp.asarray(rng.standard_normal((nb, bs, bs)).astype(np.float32))
    cidx_np = rng.integers(0, n, (nb, bs))
    ridx_np = rng.integers(0, n, (nb, bs))
    cidx = jnp.asarray(cidx_np.astype(np.int32))
    ridx = jnp.asarray(ridx_np.astype(np.int32))
    # sorted-scatter metadata (host-side, once)
    flat_targets = ridx_np.reshape(-1)
    perm_np = np.argsort(flat_targets, kind="stable")
    perm = jnp.asarray(perm_np.astype(np.int32))
    sorted_targets = jnp.asarray(flat_targets[perm_np].astype(np.int32))

    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    bytes_per = nb * bs * bs * 4

    def full(v):
        xg = v[cidx]
        yp = jnp.einsum("bmk,bk->bm", vals, xg)
        return jnp.zeros(n, jnp.float32).at[ridx.reshape(-1)].add(yp.reshape(-1))

    def no_scatter(v):
        xg = v[cidx]
        yp = jnp.einsum("bmk,bk->bm", vals, xg)
        return jnp.broadcast_to(jnp.sum(yp) * 1e-9, (n,)) + v * 0.0

    def no_gather(v):
        xg = jnp.broadcast_to(v[:bs], (nb, bs))
        yp = jnp.einsum("bmk,bk->bm", vals, xg)
        return jnp.zeros(n, jnp.float32).at[ridx.reshape(-1)].add(yp.reshape(-1))

    def gemm_only(v):
        xg = jnp.broadcast_to(v[:bs], (nb, bs))
        yp = jnp.einsum("bmk,bk->bm", vals, xg)
        return jnp.broadcast_to(jnp.sum(yp) * 1e-9, (n,)) + v * 0.0

    def sorted_scatter(v):
        xg = v[cidx]
        yp = jnp.einsum("bmk,bk->bm", vals, xg)
        contrib = yp.reshape(-1)[perm]
        return jax.ops.segment_sum(
            contrib, sorted_targets, num_segments=n, indices_are_sorted=True
        )

    from blocksparse_tpu.ops.pallas.mask_select import (
        mask_gather, mask_scatter_add,
    )

    def mask_g(v):
        xg = mask_gather(v, cidx)
        yp = jnp.einsum("bmk,bk->bm", vals, xg)
        return jnp.zeros(n, jnp.float32).at[ridx.reshape(-1)].add(yp.reshape(-1))

    def mask_full(v):
        xg = mask_gather(v, cidx)
        yp = jnp.einsum("bmk,bk->bm", vals, xg)
        return mask_scatter_add(yp.reshape(-1), ridx.reshape(-1), n)

    for name, fn in [
        ("full", full),
        ("no_scatter", no_scatter),
        ("no_gather", no_gather),
        ("gemm_only", gemm_only),
        ("sorted_scatter", sorted_scatter),
        ("mask_gather", mask_g),
        ("mask_full", mask_full),
    ]:
        t0 = time.time()
        step = lambda v, f=fn: f(v) * 0.01 + v * 1e-6
        dt = chained_time_per_iter(step, x, iters_lo=5, iters_hi=25, repeats=2)
        print(
            f"{name}: {dt*1e6:.1f} us, {bytes_per/dt/1e9:.0f} GB/s "
            f"({100*bytes_per/dt/819e9:.1f}%) [wall {time.time()-t0:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
