"""Round-3 probe: RW/step-tax calibration for the panel kernel.

Builds each config's panel plan under two step-tax settings (the knob that
trades grid steps against the rs window one-hot, core/panel._STEP_TAX) and
times both on the chip.  Decides the shipped tax value.

Run: nohup python benchmarks/proto_r3_rw.py > /tmp/rw.log 2>&1 &
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import blocksparse_tpu.core.panel as P  # noqa: E402
from bench import build_config2, build_config3, build_config_s  # noqa: E402
from blocksparse_tpu.ops.pallas.panel_spmv import (  # noqa: E402
    panel_apply, panel_device_arrays)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402


def main():
    rng = np.random.default_rng(5)
    for name, build, sym in (("c2", build_config2, True),
                             ("c3", build_config3, False),
                             ("cS", build_config_s, False)):
        A = build()
        if sym:
            logical = (A._dlayout.nnz + A._olayout.nnz) * 4 \
                + 2 * A.shape[0] * 4
        else:
            logical = A._layout.nnz * 4 + (A.shape[0] + A.shape[1]) * 4
        roof = logical / 820e9
        x = jnp.asarray(
            rng.standard_normal(A.shape[1]).astype(np.float32))
        for tax in (1 << 17, 1 << 13):
            P._STEP_TAX = tax
            if sym:
                plan = P.panel_plan_symmetric(A._dlayout, A._olayout)
            else:
                plan = P.panel_plan_from_layout(A._layout)
            dev = panel_device_arrays(plan)
            stream = plan.tile_bytes + plan.aux_bytes
            fn = jax.jit(lambda v, plan=plan, dev=dev:
                         panel_apply(plan, dev, v))
            st = chained_time_per_iter(
                lambda v: fn(v) * 1e-3, x, iters_lo=8, iters_hi=40,
                repeats=5, reduce="stats")
            print(
                f"{name} tax={tax>>10}K: S={plan.S} TS={plan.TS} "
                f"RW={plan.RW} CW={plan.CW} stream={stream/1e6:.1f}MB | "
                f"{st['min']*1e6:6.1f}/{st['median']*1e6:6.1f} us = "
                f"{100*roof/st['median']:5.1f}% logical "
                f"({stream/st['median']/1e9:4.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
