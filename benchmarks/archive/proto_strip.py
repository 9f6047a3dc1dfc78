"""Prototype: uniform [8,128]-tile strip engine for SpMV (round 2).

Every contiguous-range block is decomposed into 8x128 tiles placed on the
8-aligned row grid and 128-aligned col grid.  ALL tiles live in one
[nt, 8, 128] array with [nt] row-chunk / col-chunk tables -- one
gather/einsum/scatter for the whole operand regardless of block-shape
diversity (config2's population fragments the bucketed layout into 55
single-block buckets = 55 launches).

Symmetric fused: a second einsum over the SAME values array emits the
transposed contribution (XLA multi-output fusion keeps one HBM read).

python -u benchmarks/proto_strip.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9
RC, CC = 8, 128  # row / col tile extents


def t(fn, x0):
    return chained_time_per_iter(fn, x0, iters_lo=10, iters_hi=60, repeats=5,
                                 reduce="min")


def build_tiles(blocks, rowstarts, colstarts, n):
    """[nt,8,128] tiles + [nt] row/col chunk tables from contiguous blocks."""
    tiles, rid, cid = [], [], []
    for b, rs, cs in zip(blocks, rowstarts, colstarts):
        b = np.asarray(b, np.float32)
        m, k = b.shape
        ro, co = rs % RC, cs % CC
        mp, kp = -(-(ro + m) // RC) * RC, -(-(co + k) // CC) * CC
        pad = np.zeros((mp, kp), np.float32)
        pad[ro:ro + m, co:co + k] = b
        r0, c0 = rs // RC, cs // CC
        for i in range(mp // RC):
            for j in range(kp // CC):
                tiles.append(pad[i * RC:(i + 1) * RC, j * CC:(j + 1) * CC])
                rid.append(r0 + i)
                cid.append(c0 + j)
    return (np.stack(tiles), np.asarray(rid, np.int32),
            np.asarray(cid, np.int32))


def strip_apply(vals, rid, cid, x, n_out, *, symmetric=False, precision="highest"):
    n_in = x.shape[0]
    x128 = x.reshape(n_in // CC, CC)
    xg = x128[cid]                                  # [nt, 128]
    yf = jnp.einsum("tmk,tk->tm", vals, xg,
                    preferred_element_type=jnp.float32, precision=precision)
    y8 = jnp.zeros((n_out // RC, RC), jnp.float32).at[rid].add(yf)
    y = y8.reshape(-1)
    if symmetric:
        x8 = x.reshape(n_in // RC, RC)
        xr = x8[rid]                                # [nt, 8]
        yt = jnp.einsum("tmk,tm->tk", vals, xr,
                        preferred_element_type=jnp.float32, precision=precision)
        y128 = jnp.zeros((n_out // CC, CC), jnp.float32).at[cid].add(yt)
        y = y + y128.reshape(-1)
    return y


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # ---- config 2 --------------------------------------------------------
    from blocksparse_tpu.utils.testmatrices import random_symmetric
    d, di, o, ri, ci, (n, _) = random_symmetric(
        8, n=4096, ngroups=48, noffdiag=160, dtype=np.float32, contiguous=True)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    ov, orid, ocid = build_tiles(o, [int(r[0]) for r in ri],
                                 [int(c[0]) for c in ci], n)
    dv, drid, dcid = build_tiles(d, [int(g[0]) for g in di],
                                 [int(g[0]) for g in di], n)
    o_bytes, d_bytes = ov.size * 4, dv.size * 4
    print(f"config2: offdiag {ov.shape[0]} tiles {o_bytes/1e6:.1f} MB, "
          f"diag {dv.shape[0]} tiles {d_bytes/1e6:.1f} MB")
    ovj, dvj = jnp.asarray(ov), jnp.asarray(dv)
    orj, ocj = jnp.asarray(orid), jnp.asarray(ocid)
    drj, dcj = jnp.asarray(drid), jnp.asarray(dcid)

    @jax.jit
    def sym_mv(v):
        y = strip_apply(ovj, orj, ocj, v, n, symmetric=True)
        return y + strip_apply(dvj, drj, dcj, v, n)

    # correctness vs dense
    A = np.zeros((n, n), np.float32)
    for b, r, c in zip(o, ri, ci):
        A[np.ix_(r, c)] += b
    A = A + A.T
    for b, g in zip(d, di):
        A[np.ix_(g, g)] += b
    ref = A @ np.asarray(x)
    y = np.asarray(sym_mv(x))
    err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    print(f"config2 rel err: {err:.2e}")

    dt = t(lambda v: sym_mv(v) * 1e-3, x)
    sb = o_bytes + d_bytes
    print(f"config2 strip: {dt*1e6:.1f} us -> "
          f"{100*(sb/BW)/dt:.1f}% strip-stored roofline "
          f"({100*(19.7e6/BW)/dt:.1f}% vs current-layout stored bytes)")

    # off-diag fused alone
    dt_o = t(lambda v: strip_apply(ovj, orj, ocj, v, n, symmetric=True) * 1e-3, x)
    print(f"config2 offdiag fused alone: {dt_o*1e6:.1f} us "
          f"({o_bytes/BW*1e6:.1f} us roofline)")

    # ---- config 1 --------------------------------------------------------
    A1 = bench.build_config1()
    rows = [int(r[0]) for r in A1.rowindices]
    cols = [int(c[0]) for c in A1.colindices]
    blocks1 = [np.asarray(A1.block(i)) for i in range(len(rows))]
    v1, r1, c1 = build_tiles(blocks1, rows, cols, 4096)
    print(f"config1: {v1.shape[0]} tiles {v1.size*4/1e6:.1f} MB "
          f"(vs 3.3 MB unpadded)")
    v1j, r1j, c1j = jnp.asarray(v1), jnp.asarray(r1), jnp.asarray(c1)
    f1 = jax.jit(lambda v: strip_apply(v1j, r1j, c1j, v, 4096))
    x1 = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    y1 = np.asarray(f1(x1))
    ref1 = np.zeros(4096, np.float32)
    Ad = np.zeros((4096, 4096), np.float32)
    for b, r, c in zip(blocks1, rows, cols):
        Ad[r:r+b.shape[0], c:c+b.shape[1]] += b
    ref1 = Ad @ np.asarray(x1)
    print(f"config1 rel err: {np.max(np.abs(y1-ref1))/np.max(np.abs(ref1)):.2e}")
    dt1 = t(lambda v: f1(v) * 1e-3, x1)
    nnz1 = A1.nnz
    bytes1 = nnz1 * 4 + 2 * 4096 * 4
    print(f"config1 strip: {dt1*1e6:.1f} us -> {100*(bytes1/BW)/dt1:.1f}% "
          f"of unpadded roofline (current engine: 6.8 us / 59.6%)")


if __name__ == "__main__":
    main()
