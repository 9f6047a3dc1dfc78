"""Cover-chunk C sweep + engine shootout on the scattered fixture.

python -u benchmarks/proto_cover.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402
from blocksparse_tpu.core.layout import build_layout  # noqa: E402
from blocksparse_tpu.ops.dispatch import _xla_engine, _pallas_apply  # noqa: E402

BW = 819e9


def t(fn, x0):
    return chained_time_per_iter(fn, x0, iters_lo=5, iters_hi=25, repeats=3,
                                 reduce="median")


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(12)
    n, nblocks, bs = 16384, 400, 128
    span = int(bs * 1.3)
    blocks, rows, cols = [], [], []
    for _ in range(nblocks):
        blocks.append(rng.standard_normal((bs, bs)).astype(np.float32))
        rb = int(rng.integers(0, n - span))
        cb = int(rng.integers(0, n - span))
        rows.append(rb + np.sort(rng.choice(span, bs, replace=False)))
        cols.append(cb + np.sort(rng.choice(span, bs, replace=False)))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    logical = nblocks * bs * bs * 4 + 2 * n * 4
    roof = logical / BW
    import scipy.sparse as sp
    ref = None

    for C in (4, 8, 16, 32):
        lay = build_layout(blocks, rows, cols, (n, n), granularity="pow2",
                           chunk=C)
        if not all(b.chunk == C for b in lay.buckets):
            print(f"C={C}: not covered, skip", flush=True)
            continue
        area = lay.padded_nnz / (nblocks * bs * bs)
        dev = [(jnp.asarray(b.values), jnp.asarray(b.row_idx),
                jnp.asarray(b.col_idx)) for b in lay.buckets]

        def xla(v, lay=lay, dev=dev):
            return _xla_engine(dev, lay.buckets, n, v, transpose=False,
                               conj=False, precision="highest",
                               scatter="atomic") * 1e-6 + v * 0

        dt = t(xla, x)
        y = np.asarray(xla(x)) * 1e6
        if ref is None:
            S = sp.lil_matrix((n, n))
            for b, r, c in zip(blocks, rows, cols):
                S[np.ix_(r, c)] = S[np.ix_(r, c)] + b
            S = S.tocsr()
            ref = S @ np.asarray(x)
        err = np.max(np.abs(y - ref))
        print(f"C={C:3d} waste {area:.2f}  XLA: {dt*1e6:7.1f} us "
              f"({100*roof/dt:5.1f}% logical)  err {err:.1e}", flush=True)

        # sorted chunk-granular scatter: permute contributions into target
        # order host-side, reduce with segment_sum(indices_are_sorted) --
        # replaces the ~7 ns/index random scatter
        HIp = jax.lax.Precision.HIGHEST
        sorts = []
        for b in lay.buckets:
            ids_f = b.row_chunk_idx.reshape(-1)
            perm = np.argsort(ids_f, kind="stable")
            sorts.append((jnp.asarray(perm.astype(np.int32)),
                          jnp.asarray(ids_f[perm].astype(np.int32))))

        def xla_sorted(v, lay=lay, dev=dev, sorts=sorts):
            y = jnp.zeros(n // 128 * 128 + 256, jnp.float32)
            for b, (vals, _, _), (perm, sids) in zip(lay.buckets, dev, sorts):
                Cb = b.chunk
                mpc, kpc = b.mp // Cb, b.kp // Cb
                nb = b.nblocks
                xg2 = jnp.pad(v, (0, (-n) % Cb + b.kp)).reshape(-1, Cb)[
                    jnp.asarray(b.col_chunk_idx)].reshape(nb, b.kp)
                yp = jnp.einsum("bmk,bk->bm", jnp.asarray(b.values), xg2,
                                preferred_element_type=jnp.float32,
                                precision=HIp)
                upd = yp.reshape(nb * mpc, Cb)[perm]
                seg = jax.ops.segment_sum(
                    upd, sids, num_segments=(n + b.mp) // Cb + 1,
                    indices_are_sorted=True)
                y = y.at[: seg.size].add(seg.reshape(-1))
            return y[:n] * 1e-6 + v * 0

        dts = t(xla_sorted, x)
        errs = np.max(np.abs(np.asarray(xla_sorted(x)) * 1e6 - ref))
        print(f"            sorted-seg: {dts*1e6:7.1f} us "
              f"({100*roof/dts:5.1f}% logical)  err {errs:.1e}", flush=True)


if __name__ == "__main__":
    main()
