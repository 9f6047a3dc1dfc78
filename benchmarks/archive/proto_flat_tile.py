"""Prototype: flat-tile Pallas SpMV kernel vs the current XLA chunked engine.

Strategy under test (round 2): decompose every contiguous-range block into
C x C tiles; ONE pallas_call per matrix streams the whole tile list with
SMEM index tables (out_chunk, in_chunk, mirror_flag).  Mirror=1 tiles add the
transposed contribution from the same VMEM-resident tile read (fused
symmetric pass at r=1).

Run on the real chip:  python benchmarks/proto_flat_tile.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402


def _kernel(out_idx_ref, in_idx_ref, mirror_ref, x_ref, vals_ref, out_ref, *,
            nt, tb, any_mirror):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def body(i, _):
        t = step * tb + i

        @pl.when(t < nt)
        def _():
            o = out_idx_ref[t]
            ii = in_idx_ref[t]
            xg = x_ref[pl.ds(ii, 1), :]  # [1, C]
            v = vals_ref[i]  # [C, C] stored as tile^T (in, out)
            y = jax.lax.dot_general(
                xg, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[pl.ds(o, 1), :] += y
            if any_mirror:
                @pl.when(mirror_ref[t] == 1)
                def _():
                    xr = x_ref[pl.ds(o, 1), :]
                    yt = jax.lax.dot_general(
                        xr, v, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[pl.ds(ii, 1), :] += yt
        return 0

    jax.lax.fori_loop(0, tb, body, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("C", "n_out", "tb", "any_mirror"))
def flat_tile_spmv(vals_t, out_idx, in_idx, mirror, x, *, C, n_out, tb=32,
                   any_mirror=False):
    nt = vals_t.shape[0]
    n_in = x.shape[0]
    x2 = x.reshape(n_in // C, C)
    nsteps = -(-nt // tb)
    pad = nsteps * tb - nt
    if pad:
        vals_t = jnp.pad(vals_t, ((0, pad), (0, 0), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((n_in // C, C), lambda s, *_: (0, 0)),
            pl.BlockSpec((tb, C, C), lambda s, *_: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_out // C, C), lambda s, *_: (0, 0)),
    )
    y2 = pl.pallas_call(
        functools.partial(_kernel, nt=nt, tb=tb, any_mirror=any_mirror),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out // C, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * C * C * (2 if any_mirror else 1),
            bytes_accessed=vals_t.size * 4 + x.size * 4 + n_out * 4,
            transcendentals=0,
        ),
    )(out_idx, in_idx, mirror, x2, vals_t)
    return y2.reshape(n_out)


def build_config1(n=4096, nblocks=200, bs=64, seed=7):
    rng = np.random.default_rng(seed)
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nblocks, replace=False)
    rows = (pos // ntiles) * bs
    cols = (pos % ntiles) * bs
    blocks = np.stack([rng.standard_normal((bs, bs)).astype(np.float32)
                       for _ in range(nblocks)])
    return blocks, rows, cols, n


def main():
    print("devices:", jax.devices())
    blocks, rows, cols, n = build_config1()
    C = 64
    nt = blocks.shape[0]
    vals_t = jnp.asarray(np.transpose(blocks, (0, 2, 1)))  # tile^T: [in,out]
    out_idx = jnp.asarray((rows // C).astype(np.int32))
    in_idx = jnp.asarray((cols // C).astype(np.int32))
    mirror = jnp.zeros(nt, jnp.int32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # correctness
    y = flat_tile_spmv(vals_t, out_idx, in_idx, mirror, x, C=C, n_out=n)
    A = np.zeros((n, n), np.float32)
    for b in range(nt):
        A[rows[b]:rows[b]+C, cols[b]:cols[b]+C] += blocks[b]
    ref = A @ np.asarray(x)
    err = np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref))
    print(f"forward rel err: {err:.2e}")

    nnz = nt * C * C
    bytes_min = nnz * 4 + 2 * n * 4
    roof = bytes_min / 819e9

    for tb in (16, 32, 64):
        dt = chained_time_per_iter(
            lambda v: flat_tile_spmv(vals_t, out_idx, in_idx, mirror, v,
                                     C=C, n_out=n, tb=tb) * 1e-3,
            x, iters_lo=10, iters_hi=60, repeats=5, reduce="min")
        print(f"flat-tile tb={tb}: {dt*1e6:.2f} us  "
              f"({100*roof/dt:.1f}% of roofline, roof={roof*1e6:.2f} us)")

    # symmetric-style: same tiles but all mirrored (reads once, 2 MXU ops)
    ys = flat_tile_spmv(vals_t, out_idx, in_idx, jnp.ones(nt, jnp.int32), x,
                        C=C, n_out=n, any_mirror=True)
    As = A + A.T
    refs = As @ np.asarray(x)
    errs = np.max(np.abs(np.asarray(ys) - refs)) / np.max(np.abs(refs))
    print(f"mirrored rel err: {errs:.2e}")
    for tb in (16, 32, 64):
        dt = chained_time_per_iter(
            lambda v: flat_tile_spmv(vals_t, out_idx, in_idx,
                                     jnp.ones(nt, jnp.int32), v,
                                     C=C, n_out=n, tb=tb, any_mirror=True) * 1e-3,
            x, iters_lo=10, iters_hi=60, repeats=5, reduce="min")
        print(f"mirrored tb={tb}: {dt*1e6:.2f} us  "
              f"({100*roof/dt:.1f}% of stored-roofline)")


if __name__ == "__main__":
    main()
