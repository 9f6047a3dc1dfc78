"""Config1 calibration, round 2: MXU streaming + DMA-overlap probes.

  C'  [M,128]@[128,8] matmul, consumed via max (no algebraic shortcut)
  C2  batched [g,128,128]@[128,128] matmul, max-consumed
  D   sublane reduce (reference)
  G   four INDEPENDENT 3.3MB reduces in one chain body: if per-array time
      drops below D, cross-op DMA overlap can hide the HBM ramp that caps
      single small ops -- the bench's dependent chain then underestimates
      steady-state throughput.

python -u benchmarks/proto_c1c.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9
HI = jax.lax.Precision.HIGHEST
MB = 3.28
ROOF = MB * 1e6 / BW


def t(fn, x0):
    return chained_time_per_iter(fn, x0, iters_lo=10, iters_hi=60, repeats=5,
                                 reduce="min")


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(1)
    M = int(MB * 1e6 / 4 / 128)
    W = jnp.asarray(rng.standard_normal((M, 128)).astype(np.float32))
    s0 = jnp.zeros(8, jnp.float32)

    def report(name, dt):
        print(f"{name:34s}: {dt*1e6:7.2f} us  ({100*ROOF/dt:5.1f}%  "
              f"{MB*1e6/dt/1e9:5.0f} GB/s)")

    def fC(s):
        o = jnp.zeros((128, 8), jnp.float32).at[0, :8].add(s * 1e-20) + 1.0
        p = jnp.dot(W, o, preferred_element_type=jnp.float32, precision=HI)
        return jnp.max(p, axis=0)
    report("C' matmul stream (max-consumed)", t(fC, s0))

    g = M // 128
    Wb = W[: g * 128].reshape(g, 128, 128)

    def fC2(s):
        o = jnp.zeros((128, 128), jnp.float32).at[0, :8].add(s * 1e-20) + 1.0
        p = jnp.einsum("gmk,kn->gmn", Wb, o,
                       preferred_element_type=jnp.float32, precision=HI)
        return jnp.max(p, axis=(0, 1))[:8]
    report("C2 batched 128-matmul (max)", t(fC2, s0))

    def fD(s):
        w2 = W.at[0, :8].add(s * 1e-20)
        return w2.sum(axis=0)[:8]
    report("D  sublane reduce", t(fD, s0))

    Ws = [jnp.asarray(rng.standard_normal((M, 128)).astype(np.float32))
          for _ in range(4)]

    def fG(s):
        out = s * 0.0
        for i, Wi in enumerate(Ws):
            w2 = Wi.at[0, :8].add(s * 1e-20)
            out = out + w2.sum(axis=0)[:8]
        return out
    dt4 = t(fG, s0)
    print(f"G  4x independent reduces         : {dt4*1e6:7.2f} us "
          f"({dt4/4*1e6:.2f} us/array, {100*ROOF/(dt4/4):5.1f}%)")


if __name__ == "__main__":
    main()
