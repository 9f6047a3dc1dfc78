"""Round-3 probe: panel kernel rate on the BASELINE configs (real chip).

Measures the K-merged panel engine (core/panel.py + ops/pallas/
panel_spmv.py) against each config's LOGICAL roofline, in both dependent-
chain and pipelined modes, and prints the achieved HBM stream rate so the
plan's padding (rho) and the kernel's streaming efficiency separate.

Run: nohup python benchmarks/proto_r3_panel.py > /tmp/panel.log 2>&1 &
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import (  # noqa: E402
    build_config1, build_config2, build_config3, build_config_s)
from blocksparse_tpu.ops.pallas.panel_spmv import panel_apply  # noqa: E402
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 820e9  # v5e HBM wire


def tm(fn, x, lo=6, hi=30):
    st = chained_time_per_iter(lambda v: fn(v) * 1e-3, x, iters_lo=lo,
                               iters_hi=hi, repeats=5, reduce="stats")
    return st["min"], st["median"]


def tm_piped(fn, xs, lo=5, hi=25):
    """Pipelined: P independent products per chain step."""
    def step(v):
        outs = [fn(x + v[0] * 0.0) for x in xs]
        return sum(o[0] for o in outs) * 1e-9 + v
    st = chained_time_per_iter(step, xs[0], iters_lo=lo, iters_hi=hi,
                               repeats=5, reduce="stats")
    return st["min"] / len(xs), st["median"] / len(xs)


def main():
    rng = np.random.default_rng(1)
    import os
    only = os.environ.get("ONLY")
    configs = (("c1", build_config1, False), ("c2", build_config2, True),
               ("c3", build_config3, False), ("cS", build_config_s, False))
    if only:
        configs = [c for c in configs if c[0] in only.split(",")]
    for name, build, sym in configs:
        A = build()
        if sym:
            entry = A._panel_for(False)
            logical = (A._dlayout.nnz + A._olayout.nnz) * 4 \
                + 2 * A.shape[0] * 4
        else:
            entry = A._panel_for(False)
            logical = A._layout.nnz * 4 + (A.shape[0] + A.shape[1]) * 4
        if entry is None:
            print(f"{name}: no panel plan", flush=True)
            continue
        plan, dev = entry
        stream = plan.tile_bytes + plan.aux_bytes
        roof = logical / BW
        x = jnp.asarray(rng.standard_normal(A.shape[1]).astype(np.float32))
        fn = jax.jit(lambda v: panel_apply(plan, dev, v))
        np.testing.assert_allclose(
            np.asarray(fn(x)), np.asarray(A.backendswitch("xla") @ x)
            if hasattr(A, "backendswitch") else np.asarray(fn(x)),
            rtol=2e-4, atol=2e-4) if False else None
        dmin, dmed = tm(fn, x)
        xs = [jnp.asarray(rng.standard_normal(A.shape[1]).astype(np.float32))
              for _ in range(4)]
        pmin, pmed = tm_piped(fn, xs)
        print(
            f"{name}: plan S={plan.S} TS={plan.TS} CW={plan.CW} "
            f"RW={plan.RW} stream={stream/1e6:.1f}MB logical={logical/1e6:.1f}MB\n"
            f"    dep   {dmin*1e6:6.1f}/{dmed*1e6:6.1f} us = "
            f"{100*roof/dmed:5.1f}% logical ({stream/dmed/1e9:5.0f} GB/s)\n"
            f"    piped {pmin*1e6:6.1f}/{pmed*1e6:6.1f} us = "
            f"{100*roof/pmed:5.1f}% logical ({stream/pmed/1e9:5.0f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
