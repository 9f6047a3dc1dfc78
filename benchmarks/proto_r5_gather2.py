"""Round-5 probe: panel x-gather as ONE lax.gather of 32-wide slices.

The shipped gather builds len(grids) rolled copies of x, stacks them with
a zero row, and row-gathers -- 1 pad + NG-1 rolls + concat + gather ops
(~3-5 us of op floors; the data is KBs).  A single
``lax.gather(x_pad, starts, slice_sizes=(32,))`` reads the same 32-wide
windows directly at arbitrary (shift-grid) element offsets: one op.

Measures gather-only and in-context cost on config2/3/S segid sets.

Run on the TPU: python benchmarks/proto_r5_gather2.py
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
from blocksparse_tpu.ops.pallas.panel_spmv import _gather_xs  # noqa: E402
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402


def starts_of(plan):
    """Element start offset per segid row; sentinel -> zero-pad region."""
    NC32 = plan.NC32
    grids = plan.grids_used
    sent = len(grids) * NC32
    seg = plan.segid.reshape(-1).astype(np.int64)
    gi = np.minimum(seg // NC32, len(grids) - 1)
    a = seg % NC32
    g = np.asarray(grids, np.int64)[gi]
    starts = a * SEG + g
    # sentinel reads the zero pad appended past ncols
    zero_at = -(-plan.ncols // SEG) * SEG + SEG  # inside the pad region
    starts = np.where(seg >= sent, zero_at, starts)
    return starts.astype(np.int32)


def gather_slices(x, starts, S, CW, nseg_row, ncols):
    # pad: cover max start + 32 and the sentinel zero region
    pad_to = int(-(-ncols // SEG) * SEG + 2 * SEG)
    xp = jnp.pad(x, (0, pad_to - ncols))
    out = jax.lax.gather(
        xp[:, None],
        starts[:, None, None].astype(jnp.int32),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,)),
        slice_sizes=(SEG, 1),
        mode=jax.lax.GatherScatterMode.CLIP,
    )[:, :, 0]
    return out.reshape(S, CW, nseg_row * SEG)


def main():
    import bench

    cases = [
        ("config2", bench.build_config2()),
        ("config3", bench.build_config3()),
        ("configS", bench.build_config_s()),
    ]
    for name, op in cases:
        plan = op._panel_for(False)[0]
        nseg_row = plan.segid.shape[1] // plan.CW
        st = jnp.asarray(starts_of(plan))
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal(plan.ncols).astype(np.float32))
        a = np.asarray(_gather_xs(x, jnp.asarray(plan.segid), plan.S,
                                  plan.CW, plan.NC32, plan.ncols,
                                  plan.grids_used))
        b = np.asarray(gather_slices(x, st, plan.S, plan.CW, nseg_row,
                                     plan.ncols))
        err = np.max(np.abs(a - b))
        print(f"{name}: rows={plan.segid.size} NG={len(plan.grids_used)} "
              f"parity err {err:.2e}", flush=True)
        assert err == 0.0

        f_nat = jax.jit(lambda v: _gather_xs(
            v, jnp.asarray(plan.segid), plan.S, plan.CW, plan.NC32,
            plan.ncols, plan.grids_used).sum() * 1e-30 + v)
        f_sl = jax.jit(lambda v: gather_slices(
            v, st, plan.S, plan.CW, nseg_row, plan.ncols
        ).sum() * 1e-30 + v)
        for lbl, f in (("native", f_nat), ("slice-gather", f_sl)):
            t = chained_time_per_iter(f, x, iters_lo=10, iters_hi=60,
                                      repeats=5, reduce="stats")
            print(f"  [{lbl}] {t['median']*1e6:.2f} us", flush=True)


if __name__ == "__main__":
    main()
