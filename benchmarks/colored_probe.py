#!/usr/bin/env python
"""Measure the colored gather-round plan vs scatter-add (ops/colored.py).

Two fixtures, both landing on the element-granularity engine (scattered
lists, the reference's general format-1 case,
/root/reference/src/blockmatrix.jl:236-242); backend="xla" throughout so
the ONLY difference is the scatter strategy selected by the schedule:

    schedule="serial"  -> deterministic scatter-add per bucket
    schedule="colored" -> one dense gather per color (BST_COLORED=always)

1. conflict-DENSE: many blocks accumulating into a narrow output range
   (the assembly/overlap-summing case) -- ncolors*out_len ~ n_entries, the
   regime where trading 14.5 ns scatters for 7.6 ns gathers pays.
2. conflict-SPARSE: blocks scattered over a wide output -- ncolors*out_len
   >> n_entries; the colored plan LOSES here, which is why the auto cost
   model (ops/colored.py colored_wins) keeps it off.

Run on the TPU (default backend) on an otherwise idle machine.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BST_MASK_GS", "never")  # isolate XLA scatter vs gather


def build(rng, n_rows, n_cols, nb, bs):
    import blocksparse_tpu as bst

    blocks, rows, cols = [], [], []
    for _ in range(nb):
        blocks.append(rng.standard_normal((bs, bs)).astype(np.float32))
        rows.append(np.sort(rng.choice(n_rows, bs, replace=False)))
        cols.append(np.sort(rng.choice(n_cols, bs, replace=False)))

    def mk(schedule):
        return bst.BlockSparseMatrix(
            blocks, rows, cols, (n_rows, n_cols), schedule=schedule,
            backend="xla",
        )

    return mk


def run_case(label, rng, n_rows, n_cols, nb, bs):
    import jax.numpy as jnp

    from blocksparse_tpu.utils.timing import chained_time_per_iter

    mk = build(rng, n_rows, n_cols, nb, bs)
    A_ser = mk("serial")
    A_col = mk("colored")
    ncolors = len(A_col.colors())
    x = jnp.asarray(rng.standard_normal(n_cols).astype(np.float32))

    err = float(jnp.abs((A_ser @ x) - (A_col @ x)).max())
    assert err < 1e-3, err
    t_ser = chained_time_per_iter(lambda v: A_ser.T @ ((A_ser @ v) * 1e-3),
                                  x, iters_lo=5, iters_hi=25, repeats=7,
                                  reduce="stats")
    t_col = chained_time_per_iter(lambda v: A_col.T @ ((A_col @ v) * 1e-3),
                                  x, iters_lo=5, iters_hi=25, repeats=7,
                                  reduce="stats")
    print(f"== {label}: {nb} blocks {bs}x{bs} -> {n_rows}x{n_cols}, "
          f"{ncolors} colors, max err {err:.1e}")
    print(f"  scatter-add (serial):    {t_ser['median']*1e6:8.1f} us "
          f"[{t_ser['min']*1e6:.1f}/{t_ser['max']*1e6:.1f}]")
    print(f"  gather rounds (colored): {t_col['median']*1e6:8.1f} us "
          f"[{t_col['min']*1e6:.1f}/{t_col['max']*1e6:.1f}]")
    print(f"  speedup: {t_ser['median']/t_col['median']:.2f}x")


def main():
    rng = np.random.default_rng(5)
    os.environ["BST_COLORED"] = "always"
    # conflict-dense: 500 x 16x16 blocks accumulate into 256 output rows
    run_case("dense conflicts", rng, 256, 8192, 500, 16)
    # conflict-sparse: the same blocks scattered over 8192 output rows
    run_case("sparse conflicts (colored loses; auto keeps it off)",
             rng, 8192, 8192, 256, 32)


if __name__ == "__main__":
    main()
