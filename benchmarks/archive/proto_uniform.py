"""Prototype: uniform-block slab kernel for config1 (bs x bs aligned blocks).

Each bs x bs block (bs | 128, bs >= 16) is reshaped LOSSLESSLY to
[bs*bs/128, 128] (row-major linearization), so the value stream has zero
padding.  Gather/scatter are one-hot MXU matmuls as in the general slab
kernel; the contraction multiplies by a lane-tiled x chunk and reduces
lane groups of bs:

    xg   = C_s @ xbs            [TB,NCb]@[NCb,bs] -> [TB,bs]
    xg2  = tile lanes to 128    [TB,128]
    q    = V * xg2[:,None,:]    [TB, bs*bs/128, 128]
    yf   = q.reshape(TB, bs, 128//bs... ) group-sum -> [TB, bs]
    y   += R_s^T @ yf           [nrc,TB]@[TB,bs]

python -u benchmarks/proto_uniform.py
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

BW = 819e9
HI = jax.lax.Precision.HIGHEST


def t(fn, x0):
    return chained_time_per_iter(fn, x0, iters_lo=10, iters_hi=60, repeats=5,
                                 reduce="min")


def _kernel(xbs_ref, vals_ref, rs_ref, cs_ref, y_ref, *, bs):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    V = vals_ref[:]                      # [TB, bs*bs//128, 128]
    TB = V.shape[0]
    R = rs_ref[0].astype(jnp.float32)    # [nrc, TB]
    C = cs_ref[0].astype(jnp.float32)    # [TB, ncc]
    xg = jnp.dot(C, xbs_ref[:], preferred_element_type=jnp.float32,
                 precision=HI)           # [TB, bs]
    rep = 128 // bs
    sub = (bs * bs) // 128
    xg2 = jnp.concatenate([xg] * rep, axis=1)        # [TB, 128]
    q = V * xg2[:, None, :]
    # rows r = rep*i + h; Mosaic rejects lane-splitting reshapes, so sum
    # each lane group via a slice and concatenate -> permuted row order
    # p = h*sub + i (undone by a tiny transpose outside the kernel)
    parts = [jnp.sum(q[:, :, h * bs:(h + 1) * bs], axis=2) for h in range(rep)]
    yf = jnp.concatenate(parts, axis=1)              # [TB, rep*sub == bs]
    y_ref[:] += jnp.dot(R, yf, preferred_element_type=jnp.float32,
                        precision=HI)    # [nrc, bs] (permuted row order)


@functools.partial(jax.jit, static_argnames=("S", "TB", "bs", "n"))
def uniform_spmv(vals, Rs, Cs, x, *, S, TB, bs, n):
    nrc = n // bs
    xbs = x.reshape(nrc, bs)
    sub = (bs * bs) // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((nrc, bs), lambda s: (0, 0)),
            pl.BlockSpec((TB, sub, 128), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, nrc, TB), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, TB, nrc), lambda s: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nrc, bs), lambda s: (0, 0)),
    )
    y = pl.pallas_call(
        functools.partial(_kernel, bs=bs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrc, bs), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size,
            bytes_accessed=vals.size * 4 + Rs.size * 2 + Cs.size * 2 + n * 8,
            transcendentals=0,
        ),
    )(xbs, vals, Rs, Cs)
    # undo the in-kernel lane-group permutation: position p = h*sub + i
    # holds row r = rep*i + h
    rep = 128 // bs
    return y.reshape(nrc, rep, (bs * bs) // 128).transpose(0, 2, 1).reshape(-1)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(7)
    n, nb, bs = 4096, 200, 64
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nb, replace=False)
    rows = (pos // ntiles) * bs
    cols = (pos % ntiles) * bs
    blocks = np.stack([rng.standard_normal((bs, bs)).astype(np.float32)
                       for _ in range(nb)])
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    A = np.zeros((n, n), np.float32)
    for b in range(nb):
        A[rows[b]:rows[b]+bs, cols[b]:cols[b]+bs] += blocks[b]
    ref = A @ np.asarray(x)
    nrc = n // bs
    bytes_min = nb * bs * bs * 4 + 2 * n * 4

    for TB in (50, 100, 200):
        S = -(-nb // TB)
        vals = np.zeros((S * TB, (bs * bs) // 128, 128), np.float32)
        vals[:nb] = blocks.reshape(nb, (bs * bs) // 128, 128)
        Rs = np.zeros((S, nrc, TB), np.float32)
        Cs = np.zeros((S, TB, nrc), np.float32)
        for i in range(nb):
            s, j = divmod(i, TB)
            Rs[s, rows[i] // bs, j] = 1.0
            Cs[s, j, cols[i] // bs] = 1.0
        valsj = jnp.asarray(vals)
        Rsj = jnp.asarray(Rs, jnp.bfloat16)
        Csj = jnp.asarray(Cs, jnp.bfloat16)
        f = lambda v: uniform_spmv(valsj, Rsj, Csj, v, S=S, TB=TB, bs=bs, n=n)
        y = np.asarray(f(x))
        err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
        dt = t(lambda v: f(v) * 1e-3, x)
        print(f"TB={TB} S={S}: err {err:.2e}, {dt*1e6:.2f} us -> "
              f"{100*(bytes_min/BW)/dt:.1f}% roofline (current: 6.8us/59.6%)")


if __name__ == "__main__":
    main()
