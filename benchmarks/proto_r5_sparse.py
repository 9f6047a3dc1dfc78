"""Round-5 probe: sparse sub-blocks -- densify (shipped) vs keep-sparse.

The reference keeps scipy/SparseArrays sub-blocks sparse in its hot loop
(abstractblockmatrix.jl:65-71 counts stored entries; blockmatrix.jl:236-242
dispatches to sparse gemv).  The TPU build accepts scipy sub-blocks but
densifies them into shape buckets.  This probe measures both strategies on
block populations at sub-block densities 0.01-0.3:

  dense : the shipped bucket engine (values streamed dense at HBM rate)
  sparse: keep-sparse COO evaluation -- one element gather
          ``vals * x[colidx]`` + one ``segment_sum`` into y (the TPU
          analog of per-block sparse gemv; element granularity is the
          only general form for scattered intra-block sparsity)

Expectation from the element-access cost model (docs/performance.md
"Scattered vs contiguous"): TPU random element gather/scatter runs at
~135 M indices/s = ~7.4 ns/nz, while the dense stream costs ~5 ps per
(dense) element -- densify should win for any density above ~0.1%.

Run on the TPU: python benchmarks/proto_r5_sparse.py
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
    import scipy.sparse as sp

    import blocksparse_tpu as bst

    n = 4096
    bs = 64
    nblocks = 200
    rng = np.random.default_rng(7)
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nblocks, replace=False)
    rows = [(p // ntiles) * bs for p in pos]
    cols = [(p % ntiles) * bs for p in pos]

    for density in (0.01, 0.05, 0.3):
        blocks = [sp.random(bs, bs, density=density, random_state=i,
                            dtype=np.float32, format="csr")
                  for i in range(nblocks)]
        A = bst.BlockSparseMatrix(
            [b for b in blocks],
            [np.arange(r, r + bs) for r in rows],
            [np.arange(c, c + bs) for c in cols],
            (n, n),
        )
        S = sum(b.nnz for b in blocks)
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        Ssp = bst.to_scipy(A)
        ref = Ssp @ np.asarray(x)

        # dense (shipped)
        out = np.asarray(A @ x)
        err = np.max(np.abs(out - ref)) / max(1.0, np.max(np.abs(ref)))
        assert err < 1e-5, err
        st_d = chained_time_per_iter(
            lambda v: (A @ v) * 1e-3, x, iters_lo=10, iters_hi=60,
            repeats=5, reduce="stats")

        # keep-sparse COO: global element gather + segment_sum
        coo = sp.vstack([b.tocoo() for b in blocks]).tocoo()  # block-local
        gri, gci, gv = [], [], []
        for b, r0, c0 in zip(blocks, rows, cols):
            bc = b.tocoo()
            gri.append(bc.row.astype(np.int64) + r0)
            gci.append(bc.col.astype(np.int64) + c0)
            gv.append(bc.data)
        gri = np.concatenate(gri)
        gci = np.concatenate(gci)
        gv = np.concatenate(gv)
        order = np.argsort(gri, kind="stable")
        gri_j = jnp.asarray(gri[order])
        gci_j = jnp.asarray(gci[order])
        gv_j = jnp.asarray(gv[order].astype(np.float32))

        @jax.jit
        def sparse_mv(v):
            contrib = gv_j * v[gci_j]
            return jax.ops.segment_sum(contrib, gri_j, num_segments=n,
                                       indices_are_sorted=True)

        out = np.asarray(sparse_mv(x))
        err = np.max(np.abs(out - ref)) / max(1.0, np.max(np.abs(ref)))
        assert err < 1e-5, err
        st_s = chained_time_per_iter(
            lambda v: sparse_mv(v) * 1e-3, x, iters_lo=10, iters_hi=60,
            repeats=5, reduce="stats")

        d_us = st_d["median"] * 1e6
        s_us = st_s["median"] * 1e6
        print(f"density {density}: nnz={S} | dense bucket {d_us:.1f} us | "
              f"keep-sparse {s_us:.1f} us | "
              f"winner {'dense' if d_us < s_us else 'sparse'} "
              f"({max(d_us, s_us)/min(d_us, s_us):.1f}x)", flush=True)


if __name__ == "__main__":
    main()
