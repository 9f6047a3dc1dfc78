"""Round-4 probe: dissect config1's dependent-chain 7.0 us XLA SpMV.

The chunked XLA engine wins config1 (dep 7.0 us vs panel 10.9, roofline
4.04): find where the 2.9 us over wire goes.  Ablations (each dep-chained
on the real chip):

  einsum   pre-gathered xg -> einsum only (the value-stream floor)
  +gather  x2[col_chunk] row-gather -> einsum
  +scatOH  gather -> einsum -> one-hot scatter DOT (instead of .at[].add)
  +scatter gather -> einsum -> .at[].add (the shipped graph)
  full     A @ x through dispatch
  fused3   single einsum 'wb,bmk,bc,ck->wm' (scatter+contract+gather as
           one optimized einsum path)

Also re-verifies the (64,4) G=16 patch SpMM dep outlier from
proto_r4_spmmG.py (12.0 us = 75.9% -- noise or real?).

Run: python benchmarks/proto_r4_dep.py
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


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    A = bench.build_config1()
    n = A.shape[0]
    nnz = A.nnz
    lay = A._layout
    b = lay.buckets[0]
    vals = jnp.asarray(b.values, jnp.float32)      # [nb, mp, kp]
    nb, mp, kp = vals.shape
    print(f"bucket: nb={nb} mp={mp} kp={kp} chunk={b.chunk} "
          f"contig={b.all_contiguous}", flush=True)
    gidx = jnp.asarray(b.col_chunk_idx)            # [nb, kp//C]
    sidx = jnp.asarray(b.row_chunk_idx)
    W = n // C
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    roof = (nnz * 4 + 2 * n * 4) / BW * 1e6
    ref = np.asarray(A @ x)

    # one-hot scatter matrix [W, nb*mp//C] bf16
    s_flat = np.asarray(b.row_chunk_idx).reshape(-1)
    sOH = np.zeros((W + 1, s_flat.size), np.float32)
    sOH[s_flat, np.arange(s_flat.size)] = 1.0
    sOH = jnp.asarray(sOH[:W], jnp.bfloat16)
    gOHn = np.zeros((np.asarray(b.col_chunk_idx).reshape(-1).size, W + 1),
                    np.float32)
    g_flat = np.asarray(b.col_chunk_idx).reshape(-1)
    gOHn[np.arange(g_flat.size), g_flat] = 1.0
    gOH = jnp.asarray(gOHn[:, :W], jnp.bfloat16)

    def gather(v):
        return v.reshape(W, C)[gidx].reshape(nb, kp)

    def einsum_only(xg):
        return jnp.einsum("bmk,bk->bm", vals, xg, precision=HI,
                          preferred_element_type=jnp.float32)

    def scat_add(yp):
        y2 = jnp.zeros((W, C), jnp.float32)
        return y2.at[sidx].add(yp.reshape(nb, mp // C, C)).reshape(-1)

    def scat_oh(yp):
        u = jnp.dot(sOH, yp.reshape(nb * (mp // C), C),
                    preferred_element_type=jnp.float32, precision=HI)
        return u.reshape(-1)

    variants = {
        "einsum": lambda v: einsum_only(v.reshape(W, C)[gidx].reshape(
            nb, kp) * 0 + v[:kp][None, :]).reshape(-1)[:n],  # placeholder
    }
    # einsum floor: fixed pre-gathered xg (not x-dependent; chain via +)
    xg0 = gather(x)

    def f_einsum(v):
        yp = einsum_only(xg0 + v[0] * 1e-30)
        return jnp.zeros((n,), jnp.float32).at[:nb * mp].set(
            yp.reshape(-1)[:min(n, nb * mp)])

    def f_gather_einsum(v):
        yp = einsum_only(gather(v))
        return jnp.zeros((n,), jnp.float32).at[:nb * mp].set(
            yp.reshape(-1)[:min(n, nb * mp)])

    def f_g_e_soh(v):
        return scat_oh(einsum_only(gather(v)))[:n]

    def f_g_e_sadd(v):
        return scat_add(einsum_only(gather(v)))[:n]

    def f_full(v):
        return A @ v

    def f_fused3(v):
        x2 = v.reshape(W, C)
        # gather-as-dot: xg = (gOH @ x2) [nb*kp//C, C] -> [nb, kp]
        xg = jnp.dot(gOH, x2, preferred_element_type=jnp.float32,
                     precision=HI).reshape(nb, kp)
        yp = einsum_only(xg)
        return scat_oh(yp)[:n]

    cases = [("einsum", f_einsum), ("+gather", f_gather_einsum),
             ("+scatOH", f_g_e_soh), ("+scatADD", f_g_e_sadd),
             ("full A@x", f_full), ("fused3", f_fused3)]
    for name, fn in cases:
        y = np.asarray(fn(x))
        if name in ("+scatOH", "+scatADD", "full A@x", "fused3"):
            err = np.abs(y - ref).max() / np.abs(ref).max()
        else:
            err = float("nan")
        st = chained_time_per_iter(lambda v: fn(v) * 1e-3, x,
                                   iters_lo=10, iters_hi=60, repeats=5,
                                   reduce="stats")
        us = st["median"] * 1e6
        print(f"  [{name:9s}] dep {us:5.1f} us = {100*roof/us:5.1f}% "
              f"err={err:.1e}", flush=True)

    # -- re-verify the (64,4) G=16 SpMM outlier ---------------------------
    from blocksparse_tpu.core.patch import build_patch_plan
    from blocksparse_tpu.ops.patch_engine import (patch_device_arrays,
                                                  patch_spmm)
    R = 128
    X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    roofM = (nnz * 4 + 2 * n * R * 4) / BW * 1e6
    for canvas, G in (((64, 4), 16), ((64, 4), 16), ((64, 8), 8)):
        plan = build_patch_plan(A._layout, force_canvas=canvas, force_G=G)
        dev = patch_device_arrays(plan)
        st = chained_time_per_iter(
            lambda V: patch_spmm(plan, dev, V) * 1e-3, X,
            iters_lo=5, iters_hi=25, repeats=7, reduce="stats")
        us = st["median"] * 1e6
        print(f"  [spmm {canvas} G={G}] dep {us:.1f} us = "
              f"{100*roofM/us:.1f}% (spread {st['min']*1e6:.1f}/"
              f"{st['max']*1e6:.1f})", flush=True)


if __name__ == "__main__":
    main()
