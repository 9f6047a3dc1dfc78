"""Round-5 probe: config1 batched SpMV, take 2 -- loop the gathers.

proto_r5_batched's batched SpMV lost (5.9 vs 5.3 us/product).  Hindsight
from configS: the batched advanced-index gather ``x2[:, gidx]`` lowers to
a slow XLA path.  This variant gathers per product (P fast row-gathers)
and batches only the einsums and the one-hot scatter dot -- op count
~9 for P=4 products vs ~28 serialized.

Run on the TPU: python benchmarks/proto_r5_batched2.py
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

from blocksparse_tpu.ops.xla_spmv import _multi_host_tables  # noqa: E402
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9
P = 4


def main():
    import bench

    A = bench.build_config1()
    As = [A] + [bench.build_config1(value_seed=100 + i)
                for i in range(1, P)]
    n = A.shape[0]
    roof1 = (A.nnz * 4 + 2 * n * 4) / BW * 1e6
    rng = np.random.default_rng(1)

    hbs = [hb for hb in A._layout.buckets if hb.chunk > 1]
    C = hbs[0].chunk
    gidx, goff, sOH, g_max = _multi_host_tables(tuple(hbs), n, False)
    vstacks = []
    for bi in range(len(hbs)):
        vstacks.append(jnp.stack([
            jnp.asarray(np.asarray(
                [b2 for b2 in Ai._layout.buckets if b2.chunk > 1][bi].values,
                np.float32)) for Ai in As]))
    W = -(-n // C)
    rows_in = max(W * C, (g_max + 1) * C)

    @jax.jit
    def batched_mv(xs):                                   # [P, n]
        x2s = [
            (jnp.pad(xs[p], (0, rows_in - n)) if rows_in > n else xs[p]
             ).reshape(rows_in // C, C)
            for p in range(P)
        ]
        xg_all = jnp.stack([x2[gidx] for x2 in x2s])      # P fast gathers
        rows = []
        for bi, v in enumerate(vstacks):
            nb, mp, kp = v.shape[1:]
            xg = xg_all[:, goff[bi]:goff[bi + 1]].reshape(P, nb, kp)
            yp = jnp.einsum("pbmk,pbk->pbm", v, xg,
                            preferred_element_type=jnp.float32,
                            precision=HI)
            rows.append(yp.reshape(P, nb * (mp // C), C))
        allrows = jnp.concatenate(rows, axis=1)
        u = jnp.einsum("wr,prc->pwc", sOH.astype(jnp.float32), allrows,
                       precision=HI)
        return u.reshape(P, W * C)[:, :n]

    xs = jnp.asarray(rng.standard_normal((P, n)).astype(np.float32))
    out = np.asarray(batched_mv(xs))
    for i in range(P):
        ref = np.asarray(As[i] @ xs[i])
        err = np.max(np.abs(out[i] - ref)) / np.max(np.abs(ref))
        assert err < 1e-4, (i, err)
    print("correctness ok", flush=True)
    t = chained_time_per_iter(
        lambda xc: batched_mv(xc) * 1e-3, xs, iters_lo=5, iters_hi=30,
        repeats=5, reduce="stats")
    us = t["median"] * 1e6 / P
    print(f"  [batched SpMV loop-gather P={P}] {us:.2f} us/product "
          f"({100*roof1/us:.0f}% of roofline)", flush=True)


if __name__ == "__main__":
    main()
