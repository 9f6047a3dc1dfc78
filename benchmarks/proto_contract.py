"""Microbench: which r=1 block-contraction formulation streams f32 fastest?

python benchmarks/proto_contract.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9


def t(fn, x0):
    return chained_time_per_iter(fn, x0, iters_lo=10, iters_hi=60, repeats=5,
                                 reduce="min")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(7)
    n = 4096
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # -- dense matvec upper bound -------------------------------------------
    A = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    mb = A.size * 4 / 1e6
    for name, prec in [("default", None), ("highest", "highest")]:
        def mv(u, prec=prec):
            return (A @ u if prec is None
                    else jnp.matmul(A, u, precision=prec)) * 1e-2
        dt = t(mv, x)
        print(f"dense matvec {name}: {dt*1e6:.2f} us -> {mb/1e3/dt:.0f} GB/s")

    # -- dense mat-mat r=8 --------------------------------------------------
    X8 = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    def mm8(u):
        return jnp.matmul(A, u, precision="highest") * 1e-2
    dt = t(mm8, X8)
    print(f"dense matmat r=8 highest: {dt*1e6:.2f} us -> {mb/1e3/dt:.0f} GB/s")

    # -- batched-block contraction variants, merge4 layout ------------------
    ng, mp, kpm = 72, 64, 256
    v = jnp.asarray(rng.standard_normal((ng, mp, kpm)).astype(np.float32))
    cc = jnp.asarray(rng.integers(0, n // 64, (ng, 4)).astype(np.int32))
    vb = v.size * 4 / 1e6

    def gx(u):
        return u.reshape(n // 64, 64)[cc].reshape(ng, kpm)

    def vpu_reduce(u):
        xg = gx(u)
        yp = jnp.sum(v * xg[:, None, :], axis=-1)
        return u * 0.999 + jnp.sum(yp) * 1e-20

    def einsum_hi(u):
        xg = gx(u)
        yp = jnp.einsum("bmk,bk->bm", v, xg, precision="highest",
                        preferred_element_type=jnp.float32)
        return u * 0.999 + jnp.sum(yp) * 1e-20

    def einsum_def(u):
        xg = gx(u)
        yp = jnp.einsum("bmk,bk->bm", v, xg,
                        preferred_element_type=jnp.float32)
        return u * 0.999 + jnp.sum(yp) * 1e-20

    def flat_matvec_hi(u):
        # [ng*mp, kpm] x [kpm] impossible (per-block x) -> block-diag trick no;
        # instead: [ng, mp, kpm] dot via reshape to 2D GEMM with r=ng? no.
        # single big GEMM: stack xg as rhs [kpm, ng] -> [ng*mp? ] not matching.
        xg = gx(u)
        # dot_general batched, highest
        yp = jax.lax.dot_general(v, xg, (((2,), (1,)), ((0,), (0,))),
                                 precision="highest",
                                 preferred_element_type=jnp.float32)
        return u * 0.999 + jnp.sum(yp) * 1e-20

    def vpu_sublane(u):
        # transpose-stored: vt [ng, kpm, mp]; reduce over sublane axis
        xg = gx(u)
        yp = jnp.sum(vt * xg[:, :, None], axis=1)
        return u * 0.999 + jnp.sum(yp) * 1e-20

    vt = jnp.transpose(v, (0, 2, 1))

    for name, fn in [("vpu lane-reduce", vpu_reduce),
                     ("einsum highest", einsum_hi),
                     ("einsum default", einsum_def),
                     ("dot_general hi", flat_matvec_hi),
                     ("vpu sublane-reduce", vpu_sublane)]:
        dt = t(fn, x)
        print(f"merge4 {name}: {dt*1e6:.2f} us -> {vb/1e3/dt:.0f} GB/s")

    # r=8 on the same merged layout (pad x to 8 cols)
    X8b = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    def spmm8(u):
        xg = u.reshape(n // 64, 64, 8)[cc].reshape(ng, kpm, 8)
        yp = jnp.einsum("bmk,bkr->bmr", v, xg, precision="highest",
                        preferred_element_type=jnp.float32)
        return u * 0.999 + jnp.sum(yp) * 1e-20
    dt = t(spmm8, X8b)
    print(f"merge4 spmm r=8 highest: {dt*1e6:.2f} us -> {vb/1e3/dt:.0f} GB/s")


if __name__ == "__main__":
    main()
