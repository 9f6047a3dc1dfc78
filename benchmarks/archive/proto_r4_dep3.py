"""Round-4 probe: minimal-op XLA dep chains for config1.

The shipped 3-bucket chain (7.1 us dep) serializes 3x(gather/einsum/
scatter).  Variants:

  A  shared gather (one x2[idx] over all buckets' chunks) -> 3 einsums
     -> 3 .at[].add scatters
  B  shared gather -> 3 einsums -> row-concat -> ONE one-hot scatter dot
  D  re-bucketed to uniform kp=128 (singles pad 2x, quads split) ->
     gather -> ONE einsum -> one-hot scatter dot  (ratio 1.15)

Run: python benchmarks/proto_r4_dep3.py
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

HI = jax.lax.Precision.HIGHEST
BW = 819e9
C = 64
PIPE = 4


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    A = bench.build_config1()
    n = A.shape[0]
    nnz = A.nnz
    W = n // C
    lay = A._layout
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    Xp = jnp.asarray(rng.standard_normal((n, PIPE)).astype(np.float32))
    ref = np.asarray(A @ x)
    roof = (nnz * 4 + 2 * n * 4) / BW * 1e6

    bks = [(jnp.asarray(b.values, jnp.float32), np.asarray(b.col_chunk_idx),
            np.asarray(b.row_chunk_idx)) for b in lay.buckets]
    # shared gather index: all buckets' chunk gathers flattened
    gidx_all = np.concatenate([g.reshape(-1) for _, g, _ in bks])
    gsz = [g.reshape(-1).size for _, g, _ in bks]
    goff = np.cumsum([0] + gsz)
    gidx_j = jnp.asarray(gidx_all)
    # scatter rows: all buckets' row chunks flattened (mp=64 -> 1 chunk/blk)
    sidx_all = np.concatenate([s.reshape(-1) for _, _, s in bks])
    ssz = [s.reshape(-1).size for _, _, s in bks]
    soff = np.cumsum([0] + ssz)
    sOHn = np.zeros((W, sidx_all.size), np.float32)
    sOHn[sidx_all, np.arange(sidx_all.size)] = 1.0
    sOH = jnp.asarray(sOHn, jnp.bfloat16)
    sidx_j = [jnp.asarray(s.reshape(-1)) for _, _, s in bks]

    def einsums(xg_all):
        yps = []
        for bi, (v, g, s) in enumerate(bks):
            nb, mp, kp = v.shape
            xg = xg_all[goff[bi]:goff[bi + 1]].reshape(nb, kp)
            yps.append(jnp.einsum("bmk,bk->bm", v, xg, precision=HI,
                                  preferred_element_type=jnp.float32))
        return yps

    def f_A(v):
        xg_all = v.reshape(W, C)[gidx_j]
        yps = einsums(xg_all)
        y2 = jnp.zeros((W, C), jnp.float32)
        for bi, yp in enumerate(yps):
            nb, mp = yp.shape
            y2 = y2.at[sidx_j[bi]].add(yp.reshape(nb * (mp // C), C))
        return y2.reshape(-1)

    def f_B(v):
        xg_all = v.reshape(W, C)[gidx_j]
        yps = einsums(xg_all)
        rows = jnp.concatenate(
            [yp.reshape(-1, C) for yp in yps], axis=0)
        u = jnp.dot(sOH, rows, preferred_element_type=jnp.float32,
                    precision=HI)
        return u.reshape(-1)

    # D: uniform kp=128 re-bucketing
    ent = []   # (vals [64,128], gchunks [2], rowchunk)
    for v, g, s in bks:
        vn = np.asarray(v)
        nb, mp, kp = vn.shape
        for i in range(nb):
            if kp == 64:
                ent.append((np.pad(vn[i], ((0, 0), (0, 64))),
                            [g[i, 0], 0], s[i, 0]))
            elif kp == 128:
                ent.append((vn[i], list(g[i]), s[i, 0]))
            else:
                for q in range(kp // 128):
                    ent.append((vn[i][:, q * 128:(q + 1) * 128],
                                list(g[i][2 * q:2 * q + 2]), s[i, 0]))
    vD = jnp.asarray(np.stack([e[0] for e in ent]))
    gD = jnp.asarray(np.array([e[1] for e in ent], np.int32))
    sDn = np.array([e[2] for e in ent], np.int32)
    sOHDn = np.zeros((W, len(ent)), np.float32)
    sOHDn[sDn, np.arange(len(ent))] = 1.0
    sOHD = jnp.asarray(sOHDn, jnp.bfloat16)
    nbD = len(ent)
    print(f"D: nbD={nbD} ratio={vD.size/nnz:.2f}", flush=True)

    def f_D(v):
        xg = v.reshape(W, C)[gD].reshape(nbD, 128)
        yp = jnp.einsum("bmk,bk->bm", vD, xg, precision=HI,
                        preferred_element_type=jnp.float32)
        u = jnp.dot(sOHD, yp, preferred_element_type=jnp.float32,
                    precision=HI)
        return u.reshape(-1)

    def f_full(v):
        return A @ v

    for name, fn in (("A sh-g 3at", f_A), ("B sh-g OHs", f_B),
                     ("D 1bkt OHs", f_D), ("full A@x", f_full)):
        y = np.asarray(fn(x))
        err = np.abs(y - ref).max() / np.abs(ref).max()
        st = chained_time_per_iter(lambda v: fn(v) * 1e-3, x,
                                   iters_lo=10, iters_hi=60, repeats=7,
                                   reduce="stats")
        us = st["median"] * 1e6

        def piped(Xc, fn=fn):
            cols = [fn(Xc[:, i]) for i in range(PIPE)]
            return jnp.stack(cols, axis=1) * 1e-3

        sp = chained_time_per_iter(piped, Xp, iters_lo=5, iters_hi=30,
                                   repeats=5, reduce="stats")
        pus = sp["median"] * 1e6 / PIPE
        print(f"  [{name:10s}] dep {us:5.1f} us ({100*roof/us:5.1f}%) | "
              f"piped {pus:4.1f} us ({100*roof/pus:5.1f}%) err={err:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
