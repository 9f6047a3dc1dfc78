"""Validate the VMEM-pinned carried-operator result from proto_r3_pin.

(a) timing linearity: per-iter estimate at two very different chain lengths;
(b) HLO ground truth: does the while-loop state carry the bucket values with
    an S(1) (VMEM) layout annotation?
"""

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from blocksparse_tpu.utils.timing import chained_time_per_iter
import importlib
bench = importlib.import_module("bench")

BW = 819e9


def self_dus(v):
    nd = v.ndim
    sl = jax.lax.dynamic_slice(v, (0,) * nd, (1,) * nd)
    return jax.lax.dynamic_update_slice(v, sl, (0,) * nd)


def main():
    A = bench.build_config1()
    n = A.shape[0]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    roof = (A.nnz * 4 + 2 * n * 4) / BW
    leaves, treedef = jax.tree_util.tree_flatten(A)

    def cstep(carry):
        lvs, v = carry
        lvs = [self_dus(l) if l.size > 1024 else l for l in lvs]
        Ac = jax.tree_util.tree_unflatten(treedef, lvs)
        return (lvs, (Ac @ v) * 1e-3)

    for lo, hi in ((20, 100), (200, 1000)):
        st = chained_time_per_iter(cstep, (leaves, x0), iters_lo=lo,
                                   iters_hi=hi, repeats=5, reduce="stats")
        print(f"a. iters ({lo},{hi}): {st['min']*1e6:.2f}/"
              f"{st['median']*1e6:.2f}/{st['max']*1e6:.2f} us = "
              f"{100*roof/st['median']:.1f}% of roofline")

    # (b) compiled HLO of the chain: find while-loop state shapes with S(1)
    def chain(carry, iters):
        def body(i, c):
            return cstep(c)
        out = jax.lax.fori_loop(0, iters, body, carry)
        return out[1][0]

    txt = jax.jit(chain, static_argnums=1).lower((leaves, x0), 50).compile().as_text()
    big = re.findall(r"f32\[200,64,64\]\{[^}]*\}", txt)
    from collections import Counter
    print("b. f32[200,64,64] layout annotations in optimized HLO:")
    for k, c in Counter(big).most_common():
        print(f"   {c:4d}x {k}")
    smem = "S(1)" in txt
    print(f"b. any S(1) (VMEM) annotation present: {smem}")
    # how is the while state laid out?
    for line in txt.splitlines():
        if "while(" in line or ("while" in line and "tuple" in line and "200,64,64" in line):
            print("   " + line.strip()[:300])
            break


if __name__ == "__main__":
    main()
