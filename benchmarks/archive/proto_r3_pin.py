"""Round-3 probe: VMEM pinning via exact-identity self-DUS + real operator.

1. Does writing a buffer's own [0,0] slice back to itself (numerically a
   no-op, exact) defeat while-loop invariant hoisting and pin the carried
   buffer in VMEM, like the epsilon-perturbation did?
2. Does the REAL config1 operator (XLA chunked engine) speed up when its
   bucket values are carried+self-DUS'd through the product chain?
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9


def self_dus(v):
    nd = v.ndim
    sl = jax.lax.dynamic_slice(v, (0,) * nd, (1,) * nd)
    return jax.lax.dynamic_update_slice(v, sl, (0,) * nd)


def probe_self_dus(mb):
    rng = np.random.default_rng(1)
    rows = int(mb * 1e6 / (128 * 4) // 8 * 8)
    v0 = jnp.asarray(rng.standard_normal((rows, 128)).astype(np.float32))
    real = v0.size * 4

    def cstep(carry):
        vv, x = carry
        vv = self_dus(vv)
        s = jnp.sum(vv, axis=0, keepdims=True)[:1, :128] * x[0, 0]
        return (vv, s * 1e-20 + 1.0)

    st = chained_time_per_iter(cstep, (v0, jnp.ones((1, 128), jnp.float32)),
                               iters_lo=20, iters_hi=100, repeats=5,
                               reduce="stats")
    roof = real / BW
    print(f"1. self-DUS carry {real/1e6:.1f} MB: {st['median']*1e6:.2f} us ="
          f" {100*roof/st['median']:.1f}% of HBM peak "
          f"(>110% => pin survives the no-op write)")


def probe_operator():
    sys.path.insert(0, "/root/repo")
    import importlib
    bench = importlib.import_module("bench")
    A = bench.build_config1()
    n = A.shape[0]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    roof = (A.nnz * 4 + 2 * n * 4) / BW

    # baseline: closure-constant operator (current bench dep chain)
    st = chained_time_per_iter(lambda v: (A @ v) * 1e-3, x0,
                               iters_lo=20, iters_hi=100, repeats=5,
                               reduce="stats")
    print(f"2a. config1 dep chain (closure A): {st['median']*1e6:.2f} us = "
          f"{100*roof/st['median']:.1f}% of roofline")

    # carried: bucket values flow through the chain with a self-DUS each step
    leaves, treedef = jax.tree_util.tree_flatten(A)

    def cstep(carry):
        lvs, v = carry
        lvs = [self_dus(l) if l.size > 1024 else l for l in lvs]
        Ac = jax.tree_util.tree_unflatten(treedef, lvs)
        return (lvs, (Ac @ v) * 1e-3)

    st = chained_time_per_iter(cstep, (leaves, x0),
                               iters_lo=20, iters_hi=100, repeats=5,
                               reduce="stats")
    print(f"2b. config1 dep chain (VMEM-carried A): {st['median']*1e6:.2f} us"
          f" = {100*roof/st['median']:.1f}% of roofline")
    # correctness: carried product == plain product
    y_plain = np.asarray(A @ x0)
    lvs = [self_dus(l) if l.size > 1024 else l for l in leaves]
    Ac = jax.tree_util.tree_unflatten(treedef, lvs)
    y_car = np.asarray(Ac @ x0)
    print(f"2c. exactness: max|diff| = {np.abs(y_plain - y_car).max():.3e}"
          f" (must be exactly 0)")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for mb in (3.3, 13.1, 40.0):
        probe_self_dus(mb)
    probe_operator()
