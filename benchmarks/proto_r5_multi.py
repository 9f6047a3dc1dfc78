"""Round-5 probe: config1 minimal-op chain -- one einsum via unit re-bucketing.

The round-4 chain (chunked_multi_apply) is ONE shared gather, one einsum
PER BUCKET (3 on config1: k-merge classes kp=64/128/256), one one-hot
scatter dot -- ~7 serialized ops, dep 6.2 us vs a ~5.7 us floor
(proto_r4_dep3: >=3 op floors on a 4 us product).  Re-splitting every
bucket's kp into chunk-width UNITS at host time (a lossless reshape --
[nb, 64, 256] -> 4x [64, 64] units, zero extra stream) makes all units
one [U, 64, 64] array => ONE einsum, dropping 2 ops from the chain.

Variants (dep + piped, config1):
  V0  shipped A @ x (auto -> chunked_multi_apply)
  V1  unit-merged single-einsum chain
  V2  V1 with the unit einsum in precision=None VPU form

Run on the TPU: python benchmarks/proto_r5_multi.py
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
PIPE = 4


def build_units(layout):
    """Host tables: units [U,64,C] from all chunked buckets (same mp==C)."""
    C = None
    uvals, ugidx, usrow = [], [], []
    for hb in layout.buckets:
        assert hb.chunk > 1
        if C is None:
            C = hb.chunk
        assert hb.chunk == C and hb.mp == C
        vals = np.asarray(hb.values)          # [nb, mp, kp]
        nb, mp, kp = vals.shape
        nu = kp // C
        cc = np.asarray(hb.col_chunk_idx).reshape(nb, nu)
        rr = np.asarray(hb.row_chunk_idx).reshape(nb, 1)
        for j in range(nu):
            uvals.append(vals[:, :, j * C:(j + 1) * C])
            ugidx.append(cc[:, j])
            usrow.append(rr[:, 0])
    U = np.concatenate(uvals, axis=0)
    g = np.concatenate(ugidx).astype(np.int32)
    s = np.concatenate(usrow).astype(np.int64)
    return U, g, s, C


def main():
    import bench

    A = bench.build_config1()
    As = [A] + [bench.build_config1(value_seed=100 + i)
                for i in range(1, PIPE)]
    n = A.shape[0]
    roof = (A.nnz * 4 + 2 * n * 4) / BW * 1e6
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    print(f"config1 roofline {roof:.1f} us", flush=True)

    def measure(apply_fn, label):
        dep = chained_time_per_iter(
            lambda v: apply_fn(0, v) * 1e-3, x, iters_lo=10, iters_hi=60,
            repeats=5, reduce="stats")
        X = jnp.asarray(rng.standard_normal((n, PIPE)).astype(np.float32))

        def piped(Xc):
            cols = [apply_fn(i, Xc[:, i]) for i in range(PIPE)]
            return jnp.stack(cols, axis=1) * 1e-3

        pip = chained_time_per_iter(piped, X, iters_lo=5, iters_hi=30,
                                    repeats=5, reduce="stats")
        d, p = dep["median"] * 1e6, pip["median"] * 1e6 / PIPE
        print(f"  [{label}] piped {p:.2f} us ({100*roof/p:.0f}%) | "
              f"dep {d:.2f} us ({100*roof/d:.0f}%)", flush=True)

    # V0 shipped
    measure(lambda i, v: As[i] @ v, "V0 shipped")

    # V1 unit-merged
    S = __import__("blocksparse_tpu").to_scipy(A)
    tabs = [build_units(Ai._layout) for Ai in As]
    U0, g0, s0, C = tabs[0]
    W = -(-n // C)
    sOH_np = np.zeros((W, s0.size), np.float32)
    keep = s0 < W
    sOH_np[s0[keep], np.nonzero(keep)[0]] = 1.0
    sOH = jnp.asarray(sOH_np, jnp.bfloat16)
    gidx = jnp.asarray(g0)
    g_max = int(g0.max())
    rows_in = max(-(-n // C) * C, (g_max + 1) * C)
    Uj = [jnp.asarray(t[0]) for t in tabs]

    def apply1(i, v, prec=HI):
        x2 = (jnp.pad(v[:, None], ((0, rows_in - n), (0, 0)))
              if rows_in > n else v[:, None]).reshape(rows_in // C, C, 1)
        xg = x2[gidx][..., 0]                       # [U, C]
        if prec is None:
            yp = jnp.sum(Uj[i] * xg[:, None, :], axis=-1)
        else:
            yp = jnp.einsum("umk,uk->um", Uj[i], xg,
                            preferred_element_type=jnp.float32,
                            precision=prec)
        u = jnp.dot(sOH, yp, preferred_element_type=jnp.float32,
                    precision=HI)
        return u.reshape(-1)[:n]

    out = np.asarray(apply1(0, x))
    err = np.max(np.abs(out - S @ np.asarray(x))) / np.max(np.abs(S @ np.asarray(x)))
    print(f"  V1 relerr {err:.2e}", flush=True)
    assert err < 1e-5
    measure(apply1, "V1 unit-merged")
    measure(lambda i, v: apply1(i, v, prec=None), "V2 unit VPU")


if __name__ == "__main__":
    main()
