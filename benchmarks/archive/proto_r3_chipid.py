"""Round-3 probe: identify the actual chip class behind the axon relay.

The pinned-carry probe measured 2.8 TB/s sustained on a 90 MB operand --
impossible for a v5e (819 GB/s HBM), but exactly v5p's 2765 GB/s.  Pin it
down with (a) a large bf16 matmul (v5e: 197 TFLOP/s peak, v5p: 459,
v6e: 918) and (b) a big-buffer reduce in both loop-invariant and
loop-carried form.
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from blocksparse_tpu.utils.timing import chained_time_per_iter


def main():
    d = jax.devices()[0]
    print(f"devices: {jax.devices()}, kind={d.device_kind!r}, "
          f"num_cores={getattr(d, 'num_cores', '?')}, "
          f"mem={[m.kind for m in d.addressable_memories()] if hasattr(d, 'addressable_memories') else '?'}")
    try:
        stats = d.memory_stats()
        print(f"memory_stats bytes_limit: {stats.get('bytes_limit')}")
    except Exception as e:
        print(f"memory_stats: {e}")

    rng = np.random.default_rng(0)

    # (a) bf16 matmul TFLOPs: 4096^3 * 2 = 137 GFLOP per call
    N = 4096
    A = jnp.asarray(rng.standard_normal((N, N)), dtype=jnp.bfloat16)

    def mstep(x):
        return jnp.dot(A, x, preferred_element_type=jnp.bfloat16)

    st = chained_time_per_iter(mstep, A, iters_lo=10, iters_hi=50,
                               repeats=5, reduce="stats")
    fl = 2 * N**3
    print(f"a. bf16 {N}^3 matmul: {st['median']*1e6:.1f} us = "
          f"{fl/st['median']/1e12:.1f} TFLOP/s "
          f"(v5e peak 197, v5p 459, v6e 918)")

    # (b) invariant big reduce: 512 MB
    rows = 128 * 1024 * 1024 // (128 * 4)
    v = jnp.asarray(rng.standard_normal((rows, 128)).astype(np.float32))
    real = v.size * 4

    def rstep(x):
        s = jnp.sum(v * x[0, 0], axis=0, keepdims=True)
        return s[:1, :128] * 1e-20 + 1.0

    st = chained_time_per_iter(rstep, jnp.ones((1, 128), jnp.float32),
                               iters_lo=5, iters_hi=20, repeats=5,
                               reduce="stats")
    print(f"b. invariant reduce {real/1e6:.0f}MB: {st['median']*1e6:.1f} us"
          f" = {real/st['median']/1e9:.0f} GB/s")

    # (c) carried+perturbed big reduce: 512 MB
    def cstep(carry):
        vv, x = carry
        upd = (x[0, 0] * 1e-30 + vv[0, 0]).reshape(1, 1)
        vv = jax.lax.dynamic_update_slice(vv, upd, (0, 0))
        s = jnp.sum(vv, axis=0, keepdims=True)[:1, :128] * x[0, 0]
        return (vv, s * 1e-20 + 1.0)

    st = chained_time_per_iter(cstep, (v, jnp.ones((1, 128), jnp.float32)),
                               iters_lo=5, iters_hi=20, repeats=5,
                               reduce="stats")
    print(f"c. carried reduce {real/1e6:.0f}MB: {st['median']*1e6:.1f} us"
          f" = {real/st['median']/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
