"""Round-3 probe: single-launch Pallas stream floor + lane-padding reality.

Questions (drive the round-3 latency/SpMM kernel design):
  A. What fraction of HBM peak does ONE pallas_call reach streaming a
     3.3 MB / 13 MB / 50 MB LOOP-INVARIANT operand as a pipelined grid,
     when the dependency chain flows through a tiny x (like a Krylov
     iteration)?  -> the dependent-chain latency floor for config1.
  B. Does a [nb, 64, 64] f32 array pay 2x lane padding in HBM?
  C. Per-launch overhead of a trivial pallas_call.

Methodology note: perturbing the streamed operand itself (a loop-carried
mutation) lets XLA pin it VMEM-resident -- measured >140% of HBM peak, i.e.
not an HBM stream at all.  The operand must stay a loop-INVARIANT argument
(exactly the bench situation) with the serial dependency on the x side.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9


def spmv_like_kernel(x_ref, v_ref, o_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # touch every value byte, scale by x so the chain is serial
    o_ref[:] += jnp.sum(v_ref[:], axis=0) * x_ref[0, 0]


def make_stream(step_shape, nsteps, dtype=jnp.float32):
    total = (nsteps * step_shape[0],) + step_shape[1:]
    nd = len(step_shape)

    @jax.jit
    def f(v, x):
        return pl.pallas_call(
            spmv_like_kernel,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(step_shape, lambda s: (s,) + (0,) * (nd - 1),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(step_shape[1:],
                                   lambda s: (0,) * (nd - 1),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(step_shape[1:], dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, v)

    return f, total


def t_of(fn, v, iters=(20, 100)):
    x0 = jnp.ones((1, 128), jnp.float32)

    def step(x):
        o = fn(v, x)
        # fold output back into the next x: serial chain through x only
        return (o.ravel()[:1] * 1e-20 + 1.0).reshape(1, 1) * jnp.ones(
            (1, 128), jnp.float32)

    return chained_time_per_iter(
        step, x0, iters_lo=iters[0], iters_hi=iters[1],
        repeats=5, reduce="stats")


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    for mb, step_rows in [(3.3, 16), (3.3, 64), (3.3, 128),
                          (13.1, 64), (13.1, 256), (52, 256)]:
        step_bytes = step_rows * 8 * 128 * 4
        nsteps = max(2, int(mb * 1e6 / step_bytes))
        f, tot = make_stream((step_rows, 8, 128), nsteps)
        v = jnp.asarray(rng.standard_normal(tot).astype(np.float32))
        real = v.size * 4
        st = t_of(f, v)
        roof = real / BW
        print(f"A. stream {real/1e6:.1f} MB, {nsteps} steps x "
              f"{step_bytes/1e3:.0f} KB: {st['min']*1e6:.2f}/"
              f"{st['median']*1e6:.2f}/{st['max']*1e6:.2f} us = "
              f"{100*roof/st['median']:.1f}% of peak "
              f"(best {100*roof/st['min']:.1f}%)")

    # --- B: lane padding of minor-dim-64 arrays (big enough to exceed VMEM) --
    f64, tot64 = make_stream((32, 64, 64), 100)      # 52 MB logical
    v64 = jnp.asarray(rng.standard_normal(tot64).astype(np.float32))
    st = t_of(f64, v64)
    roof = v64.size * 4 / BW
    print(f"B. pallas stream [3200,64,64] ({v64.size*4/1e6:.1f} MB logical): "
          f"{st['median']*1e6:.2f} us = {100*roof/st['median']:.1f}% of "
          f"logical peak (<60% => lane padding is real)")


if __name__ == "__main__":
    main()
