"""Round-4 probe: panel v2 kernels on the bench populations (real TPU).

For each config: plan stats (seg, stream ratio), full panel2_apply time
(dep-chained), and the fraction of the LOGICAL roofline it reaches.
Compare against the v1 numbers in proto_r4_dissect.py.

Run: python benchmarks/proto_r4_panel2.py [seg]
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

from blocksparse_tpu.core.panel2 import (  # noqa: E402
    _layout_entries, build_panel2_plan, choose_seg, panel2_plan_symmetric)
from blocksparse_tpu.ops.pallas.panel2_spmv import (  # noqa: E402
    panel2_apply, panel2_device_arrays)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9


def t_us(fn, x):
    st = chained_time_per_iter(fn, x, iters_lo=10, iters_hi=60, repeats=5,
                               reduce="stats")
    return st["median"] * 1e6, st["min"] * 1e6


def run(name, plan, logical_bytes, oracle=None, x=None):
    if plan is None:
        print(f"[{name}] no plan")
        return
    dev = panel2_device_arrays(plan)
    n = plan.ncols
    rng = np.random.default_rng(3)
    if x is None:
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    if oracle is not None:
        y = np.asarray(panel2_apply(plan, dev, x))
        err = np.abs(y - oracle).max() / max(1.0, np.abs(oracle).max())
        errs = f" err={err:.1e}"
    else:
        errs = ""
    med, mn = t_us(lambda v: panel2_apply(plan, dev, v) * 1e-3, x)
    # piped: 4 independent products in flight (the bench gate mode) --
    # gathers of one product overlap kernels of another
    PIPE = 4
    X = jnp.asarray(rng.standard_normal((n, PIPE)).astype(np.float32))

    def piped(Xc):
        cols = [panel2_apply(plan, dev, Xc[:, i]) for i in range(PIPE)]
        return jnp.stack(cols, axis=1) * 1e-3

    pmed, pmn = t_us(piped, X)
    pmed, pmn = pmed / PIPE, pmn / PIPE
    stream = plan.tile_bytes + plan.aux_bytes
    wire = stream / BW * 1e6
    lroof = logical_bytes / BW * 1e6
    print(f"[{name}] seg={plan.seg} S={plan.S} TS={plan.TS} CW={plan.CW} "
          f"mirror={plan.mirror} "
          f"ratio={stream/logical_bytes:.2f}")
    print(f"  dep {med:.1f} us = {100*lroof/med:.1f}% | "
          f"PIPED {pmed:.1f} us (min {pmn:.1f}) = {100*lroof/pmed:.1f}% "
          f"logical | piped rate {100*wire/pmed:.0f}% of wire{errs}",
          flush=True)


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    which = sys.argv[1] if len(sys.argv) > 1 else "123S"
    segs = (8, 16, 32)

    if "1" not in which:
        pass
    else:
        run_config1(bench, segs)
    if "3" in which:
        run_config3(bench, segs)
    if "2" in which:
        run_config2(bench)
    if "S" in which:
        run_configS(bench, segs)


def run_config1(bench, segs):
    A1 = bench.build_config1()
    x1 = np.random.default_rng(1).standard_normal(A1.shape[1]).astype(np.float32)
    o1 = np.asarray(A1 @ jnp.asarray(x1))
    lb1 = A1.nnz * 4 + 2 * A1.shape[0] * 4
    p = choose_seg(_layout_entries(A1._layout, transpose=False), A1.shape,
                   segs=segs)
    run("config1", p, lb1, oracle=o1, x=jnp.asarray(x1))


def run_config3(bench, segs):
    import blocksparse_tpu as bst
    V = bench.build_config3()
    xv = np.random.default_rng(2).standard_normal(V.shape[1]).astype(np.float32)
    ov = bst.to_scipy(V) @ xv
    lb3 = V.layout.nnz * 4 + 2 * V.shape[1] * 4
    p3 = choose_seg(_layout_entries(V._layout, transpose=False), V.shape,
                    segs=segs)
    run("config3", p3, lb3, oracle=ov, x=jnp.asarray(xv))


def run_config2(bench):
    import blocksparse_tpu as bst
    S = bench.build_config2()
    xs_ = np.random.default_rng(3).standard_normal(S.shape[0]).astype(np.float32)
    os_ = bst.to_scipy(S) @ xs_
    lb2 = (S._dlayout.nnz + S._olayout.nnz) * 4 + 2 * S.shape[0] * 4
    p2 = panel2_plan_symmetric(S._dlayout, S._olayout)
    run("config2", p2, lb2, oracle=os_, x=jnp.asarray(xs_))


def run_configS(bench, segs):
    import blocksparse_tpu as bst
    As = bench.build_config_s()
    xs2 = np.random.default_rng(4).standard_normal(As.shape[1]).astype(np.float32)
    osv = bst.to_scipy(As) @ xs2
    lbS = As.nnz * 4 + 2 * As.shape[0] * 4
    pS = choose_seg(_layout_entries(As._layout, transpose=False), As.shape,
                    segs=segs)
    run("configS", pS, lbS, oracle=osv, x=jnp.asarray(xs2))


if __name__ == "__main__":
    main()
