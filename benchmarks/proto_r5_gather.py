"""Round-5 probe: panel x-gather -- native row gather vs one-hot MXU matmul.

The panel engine gathers per-slab x panels with ``x32[segid]`` (a 32-wide
row gather), measured ~3 us for ~1100 rows (~11 GB/s -- XLA's row gather
is index-bound).  The patch engine showed one-hot bf16 matmuls beat
native gathers; here the equivalent is ``OH[rows, sent+1] @ x32_ext``
(OH from segid, exact 0/1), whose stream is rows x (NG*NC32+1) x 2 B.

Measures on config2 (fused symmetric) and config3 (VBCRS): the gather
alone and the full product with each gather.

Run on the TPU: python benchmarks/proto_r5_gather.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               "..", ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from blocksparse_tpu.core.panel import SEG  # noqa: E402
from blocksparse_tpu.ops.pallas.panel_spmv import (  # noqa: E402
    _gather_xs, panel_device_arrays, panel_apply)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9


def gather_oh(x, segid_flat, OH, S, CW, NC32, ncols, grids_used):
    pad = NC32 * SEG - ncols
    xp = jnp.pad(x, (0, pad)) if pad else x
    grids = [jnp.roll(xp, -g).reshape(NC32, SEG) if g else
             xp.reshape(NC32, SEG) for g in grids_used]
    x32 = jnp.concatenate(grids + [jnp.zeros((1, SEG), jnp.float32)])
    xs = jnp.dot(OH, x32, preferred_element_type=jnp.float32,
                 precision=HI)
    return xs.reshape(S, CW, SEG * (segid_flat.size // (S * CW)))


def main():
    import bench

    cases = []
    S2 = bench.build_config2()
    pe = S2._panel_for(False)
    cases.append(("config2", S2, pe[0], pe[1]))
    V3 = bench.build_config3()
    pe3 = V3._panel_for(False)
    cases.append(("config3", V3, pe3[0], pe3[1]))
    AS = bench.build_config_s()
    peS = AS._panel_for(False)
    cases.append(("configS", AS, peS[0], peS[1]))

    for name, op, plan, dev in cases:
        segid = plan.segid
        rows = segid.size
        sent = (len(plan.grids_used)) * plan.NC32
        oh_bytes = rows * (sent + 1) * 2
        print(f"{name}: gather rows={rows} NC32={plan.NC32} "
              f"NG={len(plan.grids_used)} one-hot={oh_bytes/1e3:.0f} KB "
              f"mirror={plan.mirror}", flush=True)
        OH_np = np.zeros((rows, sent + 1), np.float32)
        OH_np[np.arange(rows), segid.reshape(-1)] = 1.0
        OH = jnp.asarray(OH_np, jnp.bfloat16)

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal(plan.ncols).astype(np.float32))

        # gather-only timing
        f_nat = jax.jit(lambda v: _gather_xs(
            v, jnp.asarray(segid), plan.S, plan.CW, plan.NC32, plan.ncols,
            plan.grids_used).sum() * 1e-30 + v)
        f_oh = jax.jit(lambda v: gather_oh(
            v, segid, OH, plan.S, plan.CW, plan.NC32, plan.ncols,
            plan.grids_used).sum() * 1e-30 + v)
        a = np.asarray(_gather_xs(x, jnp.asarray(segid), plan.S, plan.CW,
                                  plan.NC32, plan.ncols, plan.grids_used))
        b = np.asarray(gather_oh(x, segid, OH, plan.S, plan.CW, plan.NC32,
                                 plan.ncols, plan.grids_used))
        err = np.max(np.abs(a - b))
        print(f"  gather parity err {err:.2e}", flush=True)
        for lbl, f in (("native", f_nat), ("one-hot", f_oh)):
            st = chained_time_per_iter(f, x, iters_lo=10, iters_hi=60,
                                       repeats=5, reduce="stats")
            print(f"  gather[{lbl}] {st['median']*1e6:.2f} us", flush=True)


if __name__ == "__main__":
    main()
