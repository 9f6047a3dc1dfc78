"""Round-3 engine shootout on the BASELINE configs (TPU).

E1: slab (BST_STRIP=always) vs auto on config2/config3 -- the tile-exact
    plan VERDICT r2 #1 names; report plan bytes and LOGICAL fractions.
E2: config4 SpMM r=128 via the patch mono-kernel (auto-routed now).
E3: config1 dep-chain via slab vs xla (VERDICT #3 latency gate).
"""
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import importlib
bench = importlib.import_module("bench")
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9
rng = np.random.default_rng(0)


def tm(fn, x, lo=10, hi=50):
    st = chained_time_per_iter(lambda v: fn(v) * 1e-3, x, iters_lo=lo,
                               iters_hi=hi, repeats=5, reduce="stats")
    return st


def show(tag, st, logical, extra=""):
    print(f"{tag:34s}: {st['min']*1e6:7.1f}/{st['median']*1e6:7.1f} us = "
          f"{100*(logical/BW)/st['median']:5.1f}% logical {extra}",
          flush=True)


# ---- E1: config2 ----------------------------------------------------------
S = bench.build_config2()
n2 = S.shape[0]
x2 = jnp.asarray(rng.standard_normal(n2).astype(np.float32))
log2 = (S._dlayout.nnz + S._olayout.nnz) * 4 + 2 * n2 * 4
o2 = None

entry = S._strip_for(False)
if entry is not None:
    plan = entry[0]
    print(f"c2 slab plan: tile {plan.tile_bytes/1e6:.1f} MB aux "
          f"{plan.aux_bytes/1e6:.2f} MB vs logical {log2/1e6:.1f} MB "
          f"(rho {plan.tile_bytes/ (log2-2*n2*4):.2f})", flush=True)
    from blocksparse_tpu.ops.pallas.slab_spmv import slab_apply

    y = np.asarray(slab_apply(plan, entry[1], x2))
    o2 = np.asarray(S @ x2)
    err = np.abs(y - o2).max() / np.abs(o2).max()
    st = tm(lambda v: slab_apply(plan, entry[1], v), x2)
    show("c2 slab", st, log2, f"(err {err:.1e})")
else:
    print("c2 slab plan: None", flush=True)

st = tm(lambda v: S @ v, x2)
show("c2 auto", st, log2)

# ---- E1: config3 ----------------------------------------------------------
V = bench.build_config3()
n3 = V.shape[1]
x3 = jnp.asarray(rng.standard_normal(n3).astype(np.float32))
log3 = V.layout.nnz * 4 + 2 * n3 * 4
entry3 = V._strip_for(False)
if entry3 is not None:
    plan3 = entry3[0]
    print(f"c3 slab plan: tile {plan3.tile_bytes/1e6:.1f} MB aux "
          f"{plan3.aux_bytes/1e6:.2f} MB vs logical {log3/1e6:.1f} MB",
          flush=True)
    from blocksparse_tpu.ops.pallas.slab_spmv import slab_apply

    y3 = np.asarray(slab_apply(plan3, entry3[1], x3))
    o3 = np.asarray(V @ x3)
    err3 = np.abs(y3 - o3).max() / np.abs(o3).max()
    st = tm(lambda v: slab_apply(plan3, entry3[1], v), x3)
    show("c3 slab", st, log3, f"(err {err3:.1e})")
else:
    print("c3 slab plan: None", flush=True)
st = tm(lambda v: V @ v, x3)
show("c3 auto", st, log3)

# ---- E2: config4 SpMM via patch ------------------------------------------
A = bench.build_config1()
n1 = A.shape[0]
X = jnp.asarray(rng.standard_normal((n1, 128)).astype(np.float32))
nnz = A.nnz
m4_bytes = nnz * 4 + 2 * n1 * 128 * 4
pe = A._patch_for()
print(f"c4 patch plan: {'None' if pe is None else 'ok'}", flush=True)
if pe is not None:
    from blocksparse_tpu.ops.dispatch import patch_wins

    print(f"c4 patch_wins(r=128): {patch_wins(pe[0], [(A._layout, 1)], 128)}",
          flush=True)
Y = np.asarray(A @ X)
Yx = bench and None
import blocksparse_tpu as bst
oracle4 = bst.to_scipy(A) @ np.asarray(X)
err4 = np.abs(Y - oracle4).max() / np.abs(oracle4).max()
st4 = chained_time_per_iter(lambda M: (A @ M) * 1e-3, X, iters_lo=5,
                            iters_hi=25, repeats=5, reduce="stats")
print(f"c4 spmm auto (patch-routed): {st4['min']*1e6:.1f}/"
      f"{st4['median']*1e6:.1f} us = "
      f"{100*(m4_bytes/BW)/st4['median']:.1f}% roofline, "
      f"{2*nnz*128/st4['median']/1e12:.2f} TFLOP/s (err {err4:.1e})",
      flush=True)

# old engine for contrast
os.environ["BST_PATCH"] = "never"
A2 = bench.build_config1()
st4b = chained_time_per_iter(lambda M: (A2 @ M) * 1e-3, X, iters_lo=5,
                             iters_hi=25, repeats=3, reduce="stats")
print(f"c4 spmm BST_PATCH=never       : {st4b['min']*1e6:.1f}/"
      f"{st4b['median']*1e6:.1f} us = "
      f"{100*(m4_bytes/BW)/st4b['median']:.1f}%", flush=True)
del os.environ["BST_PATCH"]

# ---- E3: config1 dep chain ------------------------------------------------
x1 = jnp.asarray(rng.standard_normal(n1).astype(np.float32))
log1 = nnz * 4 + 2 * n1 * 4
st = tm(lambda v: A @ v, x1)
show("c1 auto dep", st, log1)
e1 = A._strip_for(False)
if e1 is not None:
    from blocksparse_tpu.ops.pallas.slab_spmv import slab_apply

    st = tm(lambda v: slab_apply(e1[0], e1[1], v), x1)
    show("c1 slab dep", st, log1)
