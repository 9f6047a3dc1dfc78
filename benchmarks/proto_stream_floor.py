"""Pure-streaming bandwidth vs working-set size on this chip.

If a plain sublane-reduce of an N-MB array cannot hit peak HBM bandwidth at
N ~ 3-4 MB, the config-1 roofline denominator (819 GB/s at any size) is not
achievable by ANY program of that size and the gap is a platform latency
floor, not engine overhead.

python -u benchmarks/proto_stream_floor.py
"""

import os
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
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    for mb in (1, 2, 3.3, 4, 8, 16, 33, 131):
        n = int(mb * 1e6 / 4 / 128) * 128
        V = jnp.asarray(rng.standard_normal((n,)).astype(np.float32)).reshape(
            -1, 128)
        nbytes = V.size * 4

        # sublane reduce: lane-preserving sum -> [128]; scale by a traced
        # scalar derived from the chain input so the chain cannot collapse
        def red(s, V=V):
            # the carry is injected INTO the streamed array so the reduce
            # cannot be hoisted out of the timing chain
            v2 = V.at[0, :8].add(s * 1e-20)
            return v2.sum(axis=0)[:8]

        s0 = jnp.zeros((8,), jnp.float32)
        dt = t(red, s0)
        print(f"{mb:6.1f} MB reduce: {dt*1e6:7.2f} us  "
              f"{nbytes/dt/1e9:6.1f} GB/s ({100*nbytes/dt/BW:5.1f}%)")


if __name__ == "__main__":
    main()
