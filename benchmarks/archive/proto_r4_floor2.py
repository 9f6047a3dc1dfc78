"""Round-4 probe: pallas launch floor on this runtime + panel2 sweep.

1. Chained minimal pallas kernels (copy 16 KB / 256 KB, 1 or 8 grid
   steps) -- the pure launch+epilogue cost any one-kernel SpMV pays.
2. An XLA no-op chain (y = x * c) -- the XLA per-op floor.

Run: python benchmarks/proto_r4_floor2.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               "..", ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402


def t_us(fn, x):
    st = chained_time_per_iter(fn, x, iters_lo=20, iters_hi=120, repeats=5,
                               reduce="stats")
    return st["median"] * 1e6


def copy_kernel(x_ref, y_ref):
    y_ref[:] = x_ref[:] * 1.0000001


def main():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((512, 8)).astype(np.float32))

    call1 = pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((512, 8), jnp.float32),
    )
    print(f"pallas 16KB copy, no grid: {t_us(lambda v: call1(v), x):.2f} us",
          flush=True)

    grid8 = pl.pallas_call(
        copy_kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec((64, 8), lambda s: (s, 0))],
        out_specs=pl.BlockSpec((64, 8), lambda s: (s, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        out_shape=jax.ShapeDtypeStruct((512, 8), jnp.float32),
    )
    print(f"pallas 16KB copy, grid 8: {t_us(lambda v: grid8(v), x):.2f} us",
          flush=True)

    xb = jnp.asarray(np.random.default_rng(0)
                     .standard_normal((8192, 128)).astype(np.float32))
    grid_big = pl.pallas_call(
        copy_kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec((1024, 128), lambda s: (s, 0))],
        out_specs=pl.BlockSpec((1024, 128), lambda s: (s, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        out_shape=jax.ShapeDtypeStruct((8192, 128), jnp.float32),
    )
    # 4 MB in+out = 8 MB traffic -> 9.8 us wire; measures launch + rate
    print(f"pallas 4MB copy, grid 8: {t_us(lambda v: grid_big(v), xb):.2f} us"
          f" (wire {2*xb.size*4/819e9*1e6:.1f} us)", flush=True)

    print(f"xla scale op: {t_us(lambda v: v * 1.0000001, x):.2f} us",
          flush=True)
    print(f"xla 2 ops: {t_us(lambda v: (v * 1.0000001) + 0.0000001, x):.2f}"
          " us", flush=True)


if __name__ == "__main__":
    main()
