"""Prototype: slab Pallas kernel -- one-read fused symmetric SpMV.

Design (round 2): all blocks decompose into [8,128] tiles sorted by output
row chunk.  Tiles are processed in slabs of TS; per slab, gather and scatter
are ONE-HOT MXU MATMULS (measured: matmul-gather costs +1.8us where the XLA
row-gather costs +8.5us), so there are no per-tile loops anywhere:

    xg   = C_s @ x128            [TS,NC]@[NC,128]   gather of x col chunks
    yf   = rowsum(V * xg)        VPU mult + MXU ones-reduce -> [TS,8]
    y8  += R_s^T @ yf            [RW,TS]@[TS,8]     scatter to row chunks
    xr   = (R_s @ x8win) * flag  [TS,RW]@[RW,8]     mirror gather (same R_s!)
    yt   = sum_m(V * xr)         VPU -> [TS,128]
    y128 += C_s^T @ yt           [NC,TS]@[TS,128]   mirror scatter (same C_s!)

V is streamed from HBM exactly once (Mosaic double-buffers the slab DMA);
the mirror contribution reuses the VMEM-resident slab -> true one-read fused
symmetric pass (the reference reads each off-diagonal block twice,
symmetricblockmatrix.jl:394-418).

python -u benchmarks/proto_slab.py
"""

import functools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402
from blocksparse_tpu.utils.testmatrices import random_symmetric  # noqa: E402

BW = 819e9
RC, CC = 8, 128   # tile extents
RW = 128          # row-chunk window per slab (one-hot R_s width)


def t(fn, x0):
    return chained_time_per_iter(fn, x0, iters_lo=10, iters_hi=60, repeats=5,
                                 reduce="min")


def build_tiles(blocks, rowstarts, colstarts, mirrors):
    """tiles [nt,8,128], rid [nt], cid [nt], mflag [nt] sorted by rid."""
    tiles, rid, cid, mfl = [], [], [], []
    for b, rs, cs, mi in zip(blocks, rowstarts, colstarts, mirrors):
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
                mfl.append(mi)
    tiles = np.stack(tiles)
    rid = np.asarray(rid, np.int64)
    cid = np.asarray(cid, np.int64)
    mfl = np.asarray(mfl, np.float32)
    order = np.argsort(rid, kind="stable")
    return tiles[order], rid[order], cid[order], mfl[order]


def plan_slabs(tiles, rid, cid, mfl, n, TS):
    """Greedy slabs: cut when row-chunk spread would exceed RW.

    Returns device arrays: vals [S*TS,8,128], Rs [S,RW,TS], Cs [S,TS,NC],
    flag [S,1,TS], b8 [S] int32.
    """
    n8 = n // RC
    NC = n // CC
    nt = tiles.shape[0]
    slabs = []
    s0 = 0
    while s0 < nt:
        s1 = min(s0 + TS, nt)
        lo = int(rid[s0])
        # shrink until spread fits the window
        while int(rid[s1 - 1]) - lo >= RW:
            # binary-ish: cut at first tile exceeding
            hi = np.searchsorted(rid[s0:s1], lo + RW, side="left")
            s1 = s0 + int(hi)
        slabs.append((s0, s1))
        s0 = s1
    S = len(slabs)
    vals = np.zeros((S * TS, RC, CC), np.float32)
    Rs = np.zeros((S, RW, TS), np.float32)
    Cs = np.zeros((S, TS, NC), np.float32)
    flag = np.zeros((S, 1, TS), np.float32)
    b8 = np.zeros((S,), np.int32)
    for si, (a, b) in enumerate(slabs):
        cnt = b - a
        base = min(int(rid[a]), n8 - RW)
        b8[si] = base
        vals[si * TS:si * TS + cnt] = tiles[a:b]
        Rs[si, rid[a:b] - base, np.arange(cnt)] = 1.0
        Cs[si, np.arange(cnt), cid[a:b]] = 1.0
        flag[si, 0, :cnt] = mfl[a:b]
    pad_ratio = S * TS / max(nt, 1)
    print(f"  plan: {nt} tiles -> {S} slabs x {TS} (pad {pad_ratio:.2f}x)")
    return (jnp.asarray(vals), jnp.asarray(Rs, dtype=jnp.bfloat16),
            jnp.asarray(Cs, dtype=jnp.bfloat16),
            jnp.asarray(flag), jnp.asarray(b8), S)


HI = jax.lax.Precision.HIGHEST


def _kernel(b8_ref, x128_ref, x8_ref, vals_ref, rs_ref, cs_ref, fl_ref,
            y8_ref, y128_ref, *, any_mirror):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y8_ref[:] = jnp.zeros_like(y8_ref)
        y128_ref[:] = jnp.zeros_like(y128_ref)

    V = vals_ref[:]                     # [TS, 8, 128]
    TS = V.shape[0]
    R = rs_ref[0].astype(jnp.float32)   # [RW, TS]
    C = cs_ref[0].astype(jnp.float32)   # [TS, NC]
    base = b8_ref[s]

    # forward: onehot-gather -> multiply -> VPU lane-reduce -> onehot-scatter
    xg = jnp.dot(C, x128_ref[:], preferred_element_type=jnp.float32,
                 precision=HI)                                        # [TS,128]
    yf = jnp.sum(V * xg[:, None, :], axis=2)                          # [TS, 8]
    upd = jnp.dot(R, yf, preferred_element_type=jnp.float32,
                  precision=HI)                                       # [RW, 8]
    y8_ref[pl.ds(base, RW), :] += upd

    if any_mirror:
        xw = x8_ref[pl.ds(base, RW), :]                               # [RW, 8]
        xr = jnp.dot(R.T, xw, preferred_element_type=jnp.float32,
                     precision=HI)                                    # [TS, 8]
        xr = xr * fl_ref[0].reshape(TS, 1)
        yt = jnp.sum(V * xr[:, :, None], axis=1)                      # [TS,128]
        y128_ref[:] += jnp.dot(C.T, yt, preferred_element_type=jnp.float32,
                               precision=HI)


@functools.partial(jax.jit, static_argnames=("S", "TS", "n", "any_mirror"))
def slab_spmv(vals, Rs, Cs, flag, b8, x, *, S, TS, n, any_mirror):
    NC = n // CC
    n8 = n // RC
    x128 = x.reshape(NC, CC)
    x8 = x.reshape(n8, RC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((NC, CC), lambda s, b8: (0, 0)),
            pl.BlockSpec((n8, RC), lambda s, b8: (0, 0)),
            pl.BlockSpec((TS, RC, CC), lambda s, b8: (s, 0, 0)),
            pl.BlockSpec((1, RW, TS), lambda s, b8: (s, 0, 0)),
            pl.BlockSpec((1, TS, NC), lambda s, b8: (s, 0, 0)),
            pl.BlockSpec((1, 1, TS), lambda s, b8: (s, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n8, RC), lambda s, b8: (0, 0)),
            pl.BlockSpec((NC, CC), lambda s, b8: (0, 0)),
        ],
    )
    y8, y128 = pl.pallas_call(
        functools.partial(_kernel, any_mirror=any_mirror),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n8, RC), jnp.float32),
            jax.ShapeDtypeStruct((NC, CC), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size * (2 if any_mirror else 1),
            bytes_accessed=vals.size * 4 + Rs.size * 4 + Cs.size * 4 + n * 8,
            transcendentals=0,
        ),
    )(b8, x128, x8, vals, Rs, Cs, flag)
    return y8.reshape(-1) + y128.reshape(-1)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    d, di, o, ri, ci, (n, _) = random_symmetric(
        8, n=4096, ngroups=48, noffdiag=160, dtype=np.float32, contiguous=True)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # diag (mirror=0) + offdiag (mirror=1) in ONE tile stream
    blocks = list(d) + list(o)
    rstarts = [int(g[0]) for g in di] + [int(r[0]) for r in ri]
    cstarts = [int(g[0]) for g in di] + [int(c[0]) for c in ci]
    mirrors = [0.0] * len(d) + [1.0] * len(o)
    tiles, rid, cid, mfl = build_tiles(blocks, rstarts, cstarts, mirrors)
    sb = tiles.size * 4
    print(f"config2 unified: {tiles.shape[0]} tiles {sb/1e6:.1f} MB "
          f"(roofline {sb/BW*1e6:.1f} us)")

    # dense oracle
    A = np.zeros((n, n), np.float32)
    for b, r, c in zip(o, ri, ci):
        A[np.ix_(r, c)] += b
    A = A + A.T
    for b, g in zip(d, di):
        A[np.ix_(g, g)] += b
    ref = A @ np.asarray(x)

    for TS in (256, 512, 768):
        vals, Rs, Cs, flag, b8, S = plan_slabs(tiles, rid, cid, mfl, n, TS)
        f = lambda v: slab_spmv(vals, Rs, Cs, flag, b8, v, S=S, TS=TS, n=n,
                                any_mirror=True)
        y = np.asarray(f(x))
        err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
        aux = (Rs.size + Cs.size) * 4
        dt = t(lambda v: f(v) * 1e-3, x)
        print(f"  TS={TS}: err {err:.2e}, {dt*1e6:.1f} us -> "
              f"{100*(sb/BW)/dt:.1f}% stored roofline "
              f"(aux one-hots {aux/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
