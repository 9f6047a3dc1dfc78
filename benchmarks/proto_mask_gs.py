"""Direct mask-select vs XLA gather/scatter measurement (256K indices).

python -u benchmarks/proto_mask_gs.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402
from blocksparse_tpu.ops.pallas.mask_select import (  # noqa: E402
    mask_gather, mask_scatter_add,
)


def t(fn, x0, lo=5, hi=25):
    return chained_time_per_iter(fn, x0, iters_lo=lo, iters_hi=hi, repeats=3,
                                 reduce="min")


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    nb, bs, n = 2000, 128, 8192
    K = nb * bs
    cidx = jnp.asarray(rng.integers(0, n, (nb, bs)).astype(np.int32))
    ridx = jnp.asarray(rng.integers(0, n, (nb, bs)).astype(np.int32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    vals = jnp.asarray(rng.standard_normal((nb, bs, bs)).astype(np.float32))
    vflat = jnp.asarray(rng.standard_normal(K).astype(np.float32))

    # correctness on-chip first
    g = np.asarray(mask_gather(x, cidx))
    print("gather err:", np.max(np.abs(g - np.asarray(x)[np.asarray(cidx)])),
          flush=True)
    y = np.asarray(mask_scatter_add(vflat, ridx.reshape(-1), n))
    ref = np.zeros(n, np.float32)
    np.add.at(ref, np.asarray(ridx).reshape(-1), np.asarray(vflat))
    print("scatter err:",
          np.max(np.abs(y - ref)) / max(1, np.max(np.abs(ref))), flush=True)

    def xla_gather(v):
        return v[cidx].sum(axis=1) * 1e-6 + v[:nb] * 0  # consume [nb]

    def m_gather(v):
        return mask_gather(v, cidx).sum(axis=1) * 1e-6 + v[:nb] * 0

    def xla_scatter(v):
        y = jnp.zeros(n, jnp.float32).at[ridx.reshape(-1)].add(
            jnp.broadcast_to(v[0], (K,)))
        return y[:nb] * 1e-6 + v * 0

    def m_scatter(v):
        y = mask_scatter_add(jnp.broadcast_to(v[0], (K,)), ridx.reshape(-1), n)
        return y[:nb] * 1e-6 + v * 0

    def full_xla(v):
        xg = v[cidx]
        yp = jnp.einsum("bmk,bk->bm", vals, xg)
        y = jnp.zeros(n, jnp.float32).at[ridx.reshape(-1)].add(yp.reshape(-1))
        return y * 1e-6 + v * 0

    def full_mask(v):
        xg = mask_gather(v, cidx)
        yp = jnp.einsum("bmk,bk->bm", vals, xg)
        y = mask_scatter_add(yp.reshape(-1), ridx.reshape(-1), n)
        return y * 1e-6 + v * 0

    xnb = x[:nb]
    for name, fn, x0 in [
        ("xla gather 256K", xla_gather, xnb),
        ("mask gather 256K", m_gather, xnb),
        ("xla scatter 256K", xla_scatter, xnb),
        ("mask scatter 256K", m_scatter, xnb),
        ("full SpMV xla", full_xla, x),
        ("full SpMV mask", full_mask, x),
    ]:
        dt = t(fn, x0)
        extra = ""
        if name.startswith("full"):
            bytes_min = nb * bs * bs * 4
            extra = (f"  {bytes_min/dt/1e9:5.0f} GB/s vals "
                     f"({100*bytes_min/dt/819e9:4.1f}% roofline)")
        print(f"{name:18s}: {dt*1e6:9.1f} us  "
              f"{K/dt/1e6:7.0f} M idx/s{extra}", flush=True)


if __name__ == "__main__":
    main()
