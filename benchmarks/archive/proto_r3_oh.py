"""Round-3 probe: merged-patch engines for heterogeneous populations.

Shapes model config2 after a "ragged patch merge" at chunk 32:
48 merged slots [96, 384] f32 (7.1 MB), each needing 12 col-chunk gathers of
32 elements and one 96-row window scatter.

1. r=1 one-hot engine (all XLA): xg = einsum(gOH, x32), contract, scatter
   via einsum(sOH^T, yp).  bf16 one-hots are exact (0/1 times f32 at HIGHEST).
2. r=1 native-gather engine (current chunked path at C=32): x2[idx] rows.
3. r=128 patch mono-kernel (pallas): X,Y VMEM-resident, scalar-prefetched
   chunk tables, per-slot dynamic-slice gathers + one MXU dot per slot.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9
HI = jax.lax.Precision.HIGHEST

NB, MP, KP, C = 48, 96, 384, 32
N = 4096
NC = N // C          # 128 col chunks
KC = KP // C         # 12 chunks per slot
NR8 = N // 32        # row chunks at 32 for scatter one-hot


def build():
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((NB, MP, KP)).astype(np.float32)
    cidx = np.stack([rng.choice(NC, KC, replace=False) for _ in range(NB)])
    rstart = np.sort(rng.choice(N // 32 - MP // 32, NB, replace=False)) * 32
    # one-hots
    gOH = np.zeros((NB * KC, NC), np.float32)
    gOH[np.arange(NB * KC), cidx.reshape(-1)] = 1.0
    # scatter: each slot's MP/32 row chunks
    RC_ = MP // 32
    sOH = np.zeros((NB * RC_, NR8), np.float32)
    rows = (rstart[:, None] // 32 + np.arange(RC_)[None, :]).reshape(-1)
    sOH[np.arange(NB * RC_), rows] = 1.0
    return (jnp.asarray(vals), jnp.asarray(cidx.astype(np.int32)),
            jnp.asarray(rstart.astype(np.int32)),
            jnp.asarray(gOH, dtype=jnp.bfloat16),
            jnp.asarray(sOH, dtype=jnp.bfloat16))


def t_chain(step, x0, iters=(20, 100)):
    return chained_time_per_iter(step, x0, iters_lo=iters[0],
                                 iters_hi=iters[1], repeats=5, reduce="stats")


def main():
    print(f"devices: {jax.devices()}")
    vals, cidx, rstart, gOH, sOH = build()
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    vbytes = vals.size * 4
    ohbytes = (gOH.size + sOH.size) * 2

    # -- 1. one-hot engine, r=1 ----------------------------------------------
    @jax.jit
    def oh_spmv(x):
        x32 = x.reshape(NC, C)
        xg = jnp.dot(gOH, x32, preferred_element_type=jnp.float32,
                     precision=HI)                      # [NB*KC, C]
        xg = xg.reshape(NB, KP)
        yp = jnp.einsum("bmk,bk->bm", vals, xg,
                        preferred_element_type=jnp.float32, precision=HI)
        yp = yp.reshape(NB * (MP // 32), C)
        y32 = jnp.dot(sOH.T, yp, preferred_element_type=jnp.float32,
                      precision=HI)                     # [NR8, C]
        return y32.reshape(-1)

    st = t_chain(lambda v: oh_spmv(v) * 1e-3, x0)
    roof = (vbytes + ohbytes) / BW
    print(f"1. one-hot spmv: {st['min']*1e6:.2f}/{st['median']*1e6:.2f} us = "
          f"{(vbytes+ohbytes)/st['median']/1e9:.0f} GB/s = "
          f"{100*roof/st['median']:.1f}% of its-bytes roofline")

    # oracle
    def dense():
        A = np.zeros((N, N), np.float32)
        v = np.asarray(vals)
        for b in range(NB):
            rs = int(rstart[b])
            for j in range(KC):
                cs = int(cidx[b, j]) * C
                A[rs:rs + MP, cs:cs + C] += v[b, :, j * C:(j + 1) * C]
        return A
    yref = dense() @ np.asarray(x0)
    err = np.abs(np.asarray(oh_spmv(x0)) - yref).max() / np.abs(yref).max()
    print(f"   correctness: rel err {err:.2e}")

    # -- 2. native-gather engine at C=32, r=1 --------------------------------
    @jax.jit
    def ng_spmv(x):
        x32 = x.reshape(NC, C)
        xg = x32[cidx].reshape(NB, KP)
        yp = jnp.einsum("bmk,bk->bm", vals, xg,
                        preferred_element_type=jnp.float32, precision=HI)
        y = jnp.zeros((NR8, C), jnp.float32)
        ridx = rstart // 32
        upd = yp.reshape(NB, MP // 32, C)
        y = y.at[ridx[:, None] + np.arange(MP // 32)[None, :]].add(upd)
        return y.reshape(-1)

    st2 = t_chain(lambda v: ng_spmv(v) * 1e-3, x0)
    err2 = np.abs(np.asarray(ng_spmv(x0)) - yref).max() / np.abs(yref).max()
    print(f"2. native-gather spmv: {st2['min']*1e6:.2f}/{st2['median']*1e6:.2f}"
          f" us = {vbytes/st2['median']/1e9:.0f} GB/s (rel err {err2:.2e})")

    # -- 3. patch mono-kernel, r=128 (pallas) --------------------------------
    R = 128
    X0 = jnp.asarray(rng.standard_normal((N, R)).astype(np.float32))
    G = 4  # slots per grid step

    def kernel(cidx_ref, rs_ref, x_ref, v_ref, y_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        for g in range(G):
            b = s * G + g
            parts = [
                x_ref[pl.ds(cidx_ref[b, j] * C, C), :] for j in range(KC)
            ]
            xg = jnp.concatenate(parts, axis=0)        # [KP, R]
            yp = jnp.dot(v_ref[g], xg,
                         preferred_element_type=jnp.float32,
                         precision=HI)                  # [MP, R]
            y_ref[pl.ds(rs_ref[b], MP), :] += yp

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB // G,),
        in_specs=[
            pl.BlockSpec((N, R), lambda s, c, r: (0, 0)),
            pl.BlockSpec((G, MP, KP), lambda s, c, r: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((N, R), lambda s, c, r: (0, 0)),
    )

    @jax.jit
    def mono_spmm(X):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((N, R), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * vals.size * R,
                bytes_accessed=vbytes + 2 * N * R * 4, transcendentals=0),
        )(cidx, rstart, X, vals)

    st3 = t_chain(lambda V: mono_spmm(V) * 1e-3, X0, iters=(10, 50))
    Yref = dense() @ np.asarray(X0)
    err3 = (np.abs(np.asarray(mono_spmm(X0)) - Yref).max()
            / np.abs(Yref).max())
    m_bytes = vbytes + 2 * N * R * 4
    print(f"3. patch mono-kernel spmm r={R}: {st3['min']*1e6:.2f}/"
          f"{st3['median']*1e6:.2f} us = {100*(m_bytes/BW)/st3['median']:.1f}%"
          f" of roofline, {2*vals.size*R/st3['median']/1e12:.2f} TFLOP/s "
          f"(rel err {err3:.2e})")

    # r=1 variant of the mono-kernel (latency path probe)
    def kernel1(cidx_ref, rs_ref, x_ref, v_ref, y_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        for g in range(G):
            b = s * G + g
            parts = [
                x_ref[0, pl.ds(cidx_ref[b, j] * C, C)] for j in range(KC)
            ]
            xg = jnp.concatenate(parts, axis=0)        # [KP]
            yp = jnp.sum(v_ref[g] * xg[None, :], axis=1)  # [MP]
            y_ref[0, pl.ds(rs_ref[b], MP)] += yp

    grid_spec1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB // G,),
        in_specs=[
            pl.BlockSpec((1, N), lambda s, c, r: (0, 0)),
            pl.BlockSpec((G, MP, KP), lambda s, c, r: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N), lambda s, c, r: (0, 0)),
    )

    @jax.jit
    def mono_spmv(x):
        return pl.pallas_call(
            kernel1,
            grid_spec=grid_spec1,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * vals.size,
                bytes_accessed=vbytes + 2 * N * 4, transcendentals=0),
        )(cidx, rstart, x.reshape(1, N), vals)[0]

    st4 = t_chain(lambda v: mono_spmv(v) * 1e-3, x0, iters=(20, 100))
    err4 = (np.abs(np.asarray(mono_spmv(x0)) - yref).max()
            / np.abs(yref).max())
    print(f"4. patch mono-kernel spmv: {st4['min']*1e6:.2f}/"
          f"{st4['median']*1e6:.2f} us = {vbytes/st4['median']/1e9:.0f} GB/s"
          f" (rel err {err4:.2e})")


if __name__ == "__main__":
    main()
