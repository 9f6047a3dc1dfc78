"""Round-4 probe: dissect config2/3/S panel-engine time.

For each bench config that routes to the panel engine, report:
  - which symmetric plan won (fused vs expanded) and its parameters
  - streamed bytes (tiles + aux) and the wire-time they imply
  - measured kernel time: full panel_apply, the in-kernel portion
    (pallas_call only, pre-gathered xs), and the x-gather alone
so the gap decomposes into padding vs gather overhead vs kernel rate.

Run: python benchmarks/proto_r4_dissect.py
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

from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9


def t_us(fn, x, lo=10, hi=60):
    st = chained_time_per_iter(fn, x, iters_lo=lo, iters_hi=hi, repeats=5,
                               reduce="stats")
    return st["median"] * 1e6


def dissect(name, A, layouts_reads):
    from blocksparse_tpu.ops.pallas.panel_spmv import (
        _gather_xs, _launch, panel_apply)

    n = A.shape[1]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    entry = A._panel_for(False)
    if entry is None:
        print(f"[{name}] no panel plan")
        return
    plan, dev = entry
    logical = sum(l.nnz * rd for l, rd in layouts_reads) * 4 + 2 * n * 4
    streamed = plan.tile_bytes + plan.aux_bytes
    print(f"[{name}] plan: S={plan.S} TS={plan.TS} CW={plan.CW} RW={plan.RW} "
          f"nt={plan.nt} mirror={plan.mirror} n8p={plan.n8p} NC32={plan.NC32}")
    print(f"  tile_bytes={plan.tile_bytes/1e6:.2f}MB aux={plan.aux_bytes/1e6:.3f}MB"
          f" (omap={'None' if plan.omap is None else plan.omap.shape})"
          f" logical={logical/1e6:.2f}MB ratio={streamed/logical:.2f}"
          f" pad_in_tiles={plan.vals.size*4/1e6:.2f}MB"
          f" vs real_tiles={plan.nt*8*128*4/1e6:.2f}MB")
    wire = streamed / BW * 1e6
    lroof = logical / BW * 1e6

    full = t_us(lambda v: panel_apply(plan, dev, v) * 1e-3, x)

    # kernel-only: pre-gather xs outside the timed fn
    meta = (plan.S, plan.TS, plan.CW, plan.RW, plan.n8p, plan.nrows,
            plan.ncols, plan.NC32, plan.mirror)
    full2 = t_us(lambda v: _launch(dev, v, meta=meta, interpret=False) * 1e-3,
                 x)

    xs = _gather_xs(x, jnp.asarray(plan.segid), plan.S, plan.CW, plan.NC32,
                    plan.ncols, plan.grids_used)
    gather = t_us(
        jax.jit(lambda v: _gather_xs(v, jnp.asarray(plan.segid), plan.S,
                                     plan.CW, plan.NC32, plan.ncols,
                                     plan.grids_used).sum()
                * 1e-9 + v), x)
    print(f"  wire(streamed)={wire:.1f}us logical_roof={lroof:.1f}us | "
          f"panel_apply={full:.1f}us (={100*lroof/full:.1f}% logical, "
          f"rate={100*wire/full:.1f}% of wire) launch={full2:.1f}us "
          f"gather~{gather:.1f}us")
    return dict(full=full, wire=wire, lroof=lroof)


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    S = bench.build_config2()
    dissect("config2", S, [(S._dlayout, 1), (S._olayout, 2)])
    # what did panel_plan_symmetric pick? compare both candidates
    from blocksparse_tpu.core.panel import (_MIRROR_RATE_PENALTY,
                                            build_panel_plan, _layout_entries)
    shape = (S._dlayout.nrows, S._dlayout.ncols)
    diag = _layout_entries(S._dlayout, transpose=False)
    off = _layout_entries(S._olayout, transpose=False)
    off_t = _layout_entries(S._olayout, transpose=True)
    fused = build_panel_plan(
        diag + [(b, r, c, True) for b, r, c, _ in off], shape, mirror=True)
    expanded = build_panel_plan(diag + off + off_t, shape, mirror=False)
    for nm, p in (("fused", fused), ("expanded", expanded)):
        if p is None:
            print(f"  cand {nm}: None")
        else:
            print(f"  cand {nm}: tiles={p.tile_bytes/1e6:.2f}MB "
                  f"aux={p.aux_bytes/1e6:.3f}MB S={p.S} TS={p.TS} CW={p.CW}")

    V = bench.build_config3()
    dissect("config3", V, [(V._layout, 1)])

    As = bench.build_config_s()
    dissect("configS", As, [(As._layout, 1)])

    A1 = bench.build_config1()
    dissect("config1", A1, [(A1._layout, 1)])


if __name__ == "__main__":
    main()
