"""r=1 one-read Pallas kernel on configs 1/2/3, canvas sweep (TPU)."""
import sys
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
import importlib
bench = importlib.import_module("bench")
from blocksparse_tpu.core.patch import build_patch_plan
from blocksparse_tpu.ops.patch_engine import (
    patch_device_arrays, patch_spmv_kernel)
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9
rng = np.random.default_rng(0)

S = bench.build_config2()
V = bench.build_config3()
A = bench.build_config1()
x2 = jnp.asarray(rng.standard_normal(S.shape[0]).astype(np.float32))
x3 = jnp.asarray(rng.standard_normal(V.shape[1]).astype(np.float32))
x1 = jnp.asarray(rng.standard_normal(A.shape[1]).astype(np.float32))
log2 = S.nnz * 4 + 2 * S.shape[0] * 4
log3 = V.nnz * 4 + 2 * V.shape[1] * 4
log1 = A.nnz * 4 + 2 * A.shape[0] * 4


def run(tag, plan, x, logical, oracle):
    dev = patch_device_arrays(plan)
    y = np.asarray(patch_spmv_kernel(plan, dev, x))
    err = np.abs(y - oracle).max() / np.abs(oracle).max()
    st = chained_time_per_iter(
        lambda v: patch_spmv_kernel(plan, dev, v) * 1e-3, x,
        iters_lo=10, iters_hi=50, repeats=3, reduce="stats")
    b = plan.buckets[0]
    print(f"{tag} canvas({b.MP:3d},{b.KCn:2d}) nb={b.nb:4d} "
          f"rho={plan.padded_nnz/plan.logical_nnz:.2f}: "
          f"{st['min']*1e6:6.1f}/{st['median']*1e6:6.1f} us = "
          f"{100*(logical/BW)/st['median']:5.1f}% logical  "
          f"(vals eta {100*plan.value_bytes/st['median']/BW:3.0f}%, "
          f"err {err:.1e})", flush=True)


o2 = np.asarray(S @ x2)
o3 = np.asarray(V @ x3)
o1 = np.asarray(A @ x1)

for fc in (None, (32, 8), (64, 8), (64, 16), (128, 16)):
    p = build_patch_plan(S._dlayout, extra_layout=S._olayout, force_canvas=fc)
    run("c2", p, x2, log2, o2)
print(flush=True)
for fc in (None, (32, 8), (64, 8), (128, 16)):
    p = build_patch_plan(V.layout, force_canvas=fc)
    run("c3", p, x3, log3, o3)
print(flush=True)
for fc in (None, (64, 8)):
    p = build_patch_plan(A.layout, force_canvas=fc)
    run("c1", p, x1, log1, o1)
