"""Round-3 probe B: multi-stream DMA + deliberate VMEM pinning.

1. Multi-stream: ONE pallas_call with the operand split over K separate
   input arrays (each its own BlockSpec => its own DMA pipeline).  Does the
   aggregate beat the single-stream ~69% on a 3.3 MB operand (ramp overlap)?

2. VMEM pinning: a lax.fori_loop that CARRIES the operand and perturbs one
   dead element per iteration (in-place DUS) forces XLA to treat it as
   loop-state; measured earlier at >140% of HBM peak, i.e. VMEM-resident.
   Map the capacity limit (3.3 / 6.6 / 13 / 26 MB) and confirm the
   perturb-a-dead-slot trick works when the compute is a real reduce.
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


def t_chain(step, x0, iters=(20, 100)):
    return chained_time_per_iter(
        step, x0, iters_lo=iters[0], iters_hi=iters[1],
        repeats=5, reduce="stats")


def multi_stream(nstreams, total_mb=3.3, step_rows=64):
    rng = np.random.default_rng(0)
    step_shape = (step_rows, 8, 128)
    step_bytes = step_rows * 8 * 128 * 4
    nsteps = max(1, int(total_mb * 1e6 / step_bytes / nstreams))
    tot = (nsteps * step_rows, 8, 128)
    vs = [jnp.asarray(rng.standard_normal(tot).astype(np.float32))
          for _ in range(nstreams)]
    real = sum(v.size for v in vs) * 4

    def kernel(x_ref, *refs):
        v_refs, o_refs = refs[:nstreams], refs[nstreams:]
        s = pl.program_id(0)
        for vr, orf in zip(v_refs, o_refs):
            @pl.when(s == 0)
            def _(orf=orf):
                orf[:] = jnp.zeros_like(orf)
            orf[:] += jnp.sum(vr[:], axis=0) * x_ref[0, 0]

    @jax.jit
    def f(x, *vals):
        outs = pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((1, 128), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(step_shape, lambda s: (s, 0, 0),
                            memory_space=pltpu.VMEM)] * nstreams,
            out_specs=[pl.BlockSpec((8, 128), lambda s: (0, 0),
                                    memory_space=pltpu.VMEM)] * nstreams,
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * nstreams,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, *vals)
        return outs

    def step(x):
        outs = f(x, *vs)
        tot_ = sum(o.ravel()[0] for o in outs)
        return (tot_ * 1e-20 + 1.0) * jnp.ones((1, 128), jnp.float32)

    st = t_chain(step, jnp.ones((1, 128), jnp.float32))
    roof = real / BW
    print(f"1. multi-stream x{nstreams} ({real/1e6:.1f} MB, {nsteps} steps of"
          f" {step_bytes/1e3:.0f} KB each): {st['min']*1e6:.2f}/"
          f"{st['median']*1e6:.2f} us = {100*roof/st['median']:.1f}% of peak"
          f" (best {100*roof/st['min']:.1f}%)")


def pinned(total_mb):
    rng = np.random.default_rng(1)
    rows = int(total_mb * 1e6 / (128 * 4) // 8 * 8)
    v0 = jnp.asarray(rng.standard_normal((rows, 128)).astype(np.float32))
    real = v0.size * 4

    def step(carry):
        v, x = carry
        # perturb one dead element so the carry is "modified" -> VMEM state
        upd = (x[0, 0] * 1e-30 + v[0, 0]).reshape(1, 1)
        v = jax.lax.dynamic_update_slice(v, upd, (0, 0))
        s = jnp.sum(v, axis=0, keepdims=True)[:, :128] * x[0, 0]
        xn = (s[:1, :1] * 1e-20 + 1.0) * jnp.ones((1, 128), jnp.float32)
        return (v, xn)

    st = t_chain(step, (v0, jnp.ones((1, 128), jnp.float32)))
    roof = real / BW
    print(f"2. pinned carry {real/1e6:.1f} MB reduce: {st['min']*1e6:.2f}/"
          f"{st['median']*1e6:.2f} us = {100*roof/st['median']:.1f}% of HBM "
          f"peak (>110% => VMEM-resident)")


def main():
    print(f"devices: {jax.devices()}")
    for k in (1, 2, 4, 8):
        multi_stream(k)
    multi_stream(4, total_mb=13.1)
    for mb in (3.3, 6.6, 13.1, 26.2, 50.0, 90.0):
        pinned(mb)


if __name__ == "__main__":
    main()
