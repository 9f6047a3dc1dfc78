"""Config1 formulation shootout: can anything beat ~65% at 3.3 MB?

Variants on the REAL config1 operand (200 uniform 64x64 f32 blocks):
  A  current chunk engine graph (einsum r=1, k-merged buckets)
  B  einsum with x replicated to r=8 RHS columns (MXU-shaped), col 0
  C  calibration: plain [M,128]@[128,8] matmul streaming the same bytes
  D  calibration: sublane reduce of the same bytes
  F  fold128: vals repacked losslessly to [nb,32,128], x duplicated across
     lane halves, VPU multiply + two-half lane reduce (zero padding)

python -u benchmarks/proto_c1b.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9
HI = jax.lax.Precision.HIGHEST


def t(fn, x0):
    return chained_time_per_iter(fn, x0, iters_lo=10, iters_hi=60, repeats=5,
                                 reduce="min")


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(7)
    n, nb, bs = 4096, 200, 64
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nb, replace=False)
    rows = (pos // ntiles) * bs
    cols = (pos % ntiles) * bs
    blocks = np.stack([rng.standard_normal((bs, bs)).astype(np.float32)
                       for _ in range(nb)])
    x0 = rng.standard_normal(n).astype(np.float32)
    ref = np.zeros(n, np.float32)
    for b in range(nb):
        ref[rows[b]:rows[b] + bs] += blocks[b] @ x0[cols[b]:cols[b] + bs]
    bytes_min = nb * bs * bs * 4 + 2 * n * 4
    roof = bytes_min / BW
    print(f"operand {nb*bs*bs*4/1e6:.2f} MB, roofline {roof*1e6:.2f} us")

    V = jnp.asarray(blocks)                      # [200, 64, 64]
    ridx = jnp.asarray((rows // bs).astype(np.int32))
    cidx = jnp.asarray((cols // bs).astype(np.int32))
    x = jnp.asarray(x0)

    def report(name, dt, y=None):
        err = (float(np.max(np.abs(np.asarray(y) - ref)))
               if y is not None else float("nan"))
        print(f"{name:34s}: {dt*1e6:7.2f} us  ({100*roof/dt:5.1f}%)  "
              f"err {err:.2e}")

    # -- A: current engine through the package --------------------------------
    import blocksparse_tpu as bst
    A = bst.BlockSparseMatrix(
        [blocks[b] for b in range(nb)],
        [np.arange(r, r + bs) for r in rows],
        [np.arange(c, c + bs) for c in cols], (n, n))
    fA = lambda v: (A @ v) * (1 + 1e-20)
    report("A  package engine", t(fA, x), A @ x)

    # -- B: einsum r=8 --------------------------------------------------------
    def fB(v):
        x2 = v.reshape(ntiles, bs)
        xg = x2[cidx]                            # [nb, 64]
        xg8 = jnp.broadcast_to(xg[:, :, None], (nb, bs, 8))
        y8 = jnp.einsum("bmk,bkr->bmr", V, xg8,
                        preferred_element_type=jnp.float32, precision=HI)
        y2 = jnp.zeros((ntiles + 1, bs), jnp.float32)
        y2 = y2.at[ridx].add(y8[..., 0])
        return y2[:ntiles].reshape(-1) * (1 + 1e-20)
    report("B  einsum r=8 (MXU), col0", t(fB, x), fB(x))

    # -- C: matmul stream calibration ----------------------------------------
    M = nb * bs * bs // 128
    W = jnp.asarray(rng.standard_normal((M, 128)).astype(np.float32))

    def fC(s):
        o = jnp.zeros((128, 8), jnp.float32).at[0, :8].add(s * 1e-20) + 1.0
        return jnp.dot(W, o, preferred_element_type=jnp.float32,
                       precision=HI)[0]
    report("C  [M,128]@[128,8] stream", t(fC, jnp.zeros(8, jnp.float32)))

    # -- D: reduce calibration ------------------------------------------------
    def fD(s):
        w2 = W.at[0, :8].add(s * 1e-20)
        return w2.sum(axis=0)[:8]
    report("D  sublane-reduce stream", t(fD, jnp.zeros(8, jnp.float32)))

    # -- F: fold128 -----------------------------------------------------------
    # repack: tile-row r of folded block = [row 2r | row 2r+1]? use
    # halves: lanes 0:64 = rows 0:32, lanes 64:128 = rows 32:64 (per block)
    Vf = np.concatenate([blocks[:, :32, :], blocks[:, 32:, :]], axis=2)
    Vf = jnp.asarray(Vf)                         # [200, 32, 128]

    def fF(v):
        x2 = v.reshape(ntiles, bs)
        xg = x2[cidx]                            # [nb, 64]
        xg128 = jnp.concatenate([xg, xg], axis=1)    # [nb, 128]
        z = Vf * xg128[:, None, :]               # [nb, 32, 128]
        zz = z.reshape(nb, 32, 2, 64).sum(axis=3)    # [nb, 32, 2]
        y = jnp.swapaxes(zz, 1, 2).reshape(nb, 64)   # rows 0:32 then 32:64
        y2 = jnp.zeros((ntiles + 1, bs), jnp.float32)
        y2 = y2.at[ridx].add(y)
        return y2[:ntiles].reshape(-1) * (1 + 1e-20)
    report("F  fold128 VPU", t(fF, x), fF(x))


if __name__ == "__main__":
    main()
