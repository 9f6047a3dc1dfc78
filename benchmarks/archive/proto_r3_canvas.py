"""Canvas-shape sweep for the patch engine on configs 2 and 3 (TPU)."""
import sys
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
import importlib
bench = importlib.import_module("bench")
from blocksparse_tpu.core.patch import build_patch_plan
from blocksparse_tpu.ops.patch_engine import patch_device_arrays, patch_spmv
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9
rng = np.random.default_rng(0)

S = bench.build_config2()
V = bench.build_config3()
n = S.shape[0]
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
xv = jnp.asarray(rng.standard_normal(V.shape[1]).astype(np.float32))
log2 = S.nnz * 4 + 2 * n * 4
log3 = V.nnz * 4 + 2 * V.shape[1] * 4

for MP in (32, 64, 128):
    for KC in (8, 16):
        try:
            p2 = build_patch_plan(S._dlayout, extra_layout=S._olayout,
                                  force_canvas=(MP, KC))
            d2 = patch_device_arrays(p2)
            st = chained_time_per_iter(
                lambda v: patch_spmv(p2, d2, v) * 1e-3, x,
                iters_lo=10, iters_hi=50, repeats=2, reduce="stats")
            sb = p2.value_bytes + p2.aux_bytes
            print(f"c2 ({MP:3d},{KC:2d}): nb={p2.buckets[0].nb:4d} "
                  f"rho={p2.padded_nnz/p2.logical_nnz:.2f} "
                  f"{st['median']*1e6:6.1f}us = "
                  f"{100*(log2/BW)/st['median']:5.1f}% logical "
                  f"(eta {100*sb/st['median']/BW:3.0f}%)")
        except Exception as e:
            print(f"c2 ({MP},{KC}): {type(e).__name__} {e}")
print(flush=True)
for MP in (32, 64, 128):
    for KC in (8, 16):
        try:
            p3 = build_patch_plan(V.layout, force_canvas=(MP, KC))
            d3 = patch_device_arrays(p3)
            st = chained_time_per_iter(
                lambda v: patch_spmv(p3, d3, v) * 1e-3, xv,
                iters_lo=10, iters_hi=50, repeats=2, reduce="stats")
            sb = p3.value_bytes + p3.aux_bytes
            print(f"c3 ({MP:3d},{KC:2d}): nb={p3.buckets[0].nb:4d} "
                  f"rho={p3.padded_nnz/p3.logical_nnz:.2f} "
                  f"{st['median']*1e6:6.1f}us = "
                  f"{100*(log3/BW)/st['median']:5.1f}% logical "
                  f"(eta {100*sb/st['median']/BW:3.0f}%)")
        except Exception as e:
            print(f"c3 ({MP},{KC}): {type(e).__name__} {e}")
