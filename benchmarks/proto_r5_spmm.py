"""Round-5 probe: config4 SpMM at precision=highest -- attack the M=64 ceiling.

Two questions (VERDICT r4 next-step #5):

1. **Step-count sweep** (force_G): is there a G that serves BOTH piped
   throughput and dependent-chain latency?  Round 4 shipped ~3 steps
   (piped 16.7 us) with an 8-step plan behind BST_OPT (dep 12.0 us but
   piped 18.0).  Sweep G and measure both modes at each point.

2. **Paired slots**: pack two 64-row windows into one [128, KP] canvas so
   the per-slot dot fills the whole 128-row MXU.  The canvas is
   block-diagonal (window A's chunks carry zeros in window B's rows), so
   the value stream DOUBLES; the probe quantifies whether 2x MXU fill
   beats 2x stream at 6-pass HIGHEST.

Run on the TPU: python benchmarks/proto_r5_spmm.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               "..", ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from blocksparse_tpu.core.patch import CC, build_patch_plan  # noqa: E402
from blocksparse_tpu.ops.patch_engine import (  # noqa: E402
    _slot_dot, patch_device_arrays, patch_spmm)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9
R = 128
PIPE = 4


def measure(apply_fn, n, label, roof_us):
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    dep = chained_time_per_iter(
        lambda V: apply_fn(0, V) * 1e-3, X, iters_lo=5, iters_hi=25,
        repeats=5, reduce="stats")
    Xp = jnp.asarray(rng.standard_normal((n, R * PIPE)).astype(np.float32))

    def piped(Xc):
        parts = [apply_fn(i, Xc[:, i * R:(i + 1) * R]) for i in range(PIPE)]
        return jnp.concatenate(parts, axis=1) * 1e-3

    pip = chained_time_per_iter(piped, Xp, iters_lo=3, iters_hi=10,
                                repeats=5, reduce="stats")
    d, p = dep["median"] * 1e6, pip["median"] * 1e6 / PIPE
    print(f"  [{label}] piped {p:.1f} us ({100*roof_us/p:.0f}%) | "
          f"dep {d:.1f} us ({100*roof_us/d:.0f}%)", flush=True)
    return p, d


# -- paired-slot variant ------------------------------------------------------

def build_paired(layout, KCc_pair):
    """Pair 64-row windows into [128, KCc_pair*32] block-diagonal canvases."""
    # group blocks by row start (config4: 64-aligned uniform 64x64)
    windows: dict = {}
    for i in range(layout.nblocks):
        r = layout.rowindices[i]
        c = layout.colindices[i]
        blk = np.asarray(layout.extract_block(i), np.float32)
        windows.setdefault(int(r[0]), []).append((blk, int(c[0])))
    # window k-extent in CC chunks
    wlist = []
    for w0, members in sorted(windows.items()):
        kc = sum(-(-((cs % CC) + b.shape[1]) // CC) for b, cs in members)
        wlist.append((kc, w0, members))
    wlist.sort(reverse=True)
    # first-fit pairing: big + small into one canvas
    pairs, used = [], [False] * len(wlist)
    for i, (kci, w0i, mi) in enumerate(wlist):
        if used[i]:
            continue
        used[i] = True
        partner = None
        for j in range(len(wlist) - 1, i, -1):
            if not used[j] and kci + wlist[j][0] <= KCc_pair:
                partner = j
                break
        if partner is not None:
            used[partner] = True
            pairs.append(((w0i, mi, kci), wlist[partner][1:3] + (wlist[partner][0],)))
        else:
            pairs.append(((w0i, mi, kci), None))
    nrows, ncols = layout.nrows, layout.ncols
    NC = -(-ncols // CC)
    nb_real = len(pairs)
    G = 8
    while nb_real > G * 8 and G < 64:
        G += 8
    steps = -(-nb_real // G)
    nb = steps * G
    KP = KCc_pair * CC
    vals = np.zeros((nb, 128, KP), np.float32)
    colc = np.full((nb, KCc_pair), NC, np.int32)
    rsA = np.full((nb,), nrows, np.int32)
    rsB = np.full((nb,), nrows, np.int32)
    for si, (a, b) in enumerate(pairs):
        kpos = 0
        for half, entry in enumerate((a, b)):
            if entry is None:
                continue
            w0, members, _kc = entry[0], entry[1], entry[2]
            (rsA if half == 0 else rsB)[si] = w0
            roff = 0 if half == 0 else 64
            for blk, cs in members:
                c_off = cs % CC
                kcb = -(-(c_off + blk.shape[1]) // CC)
                vals[si, roff:roff + blk.shape[0],
                     kpos * CC + c_off:kpos * CC + c_off + blk.shape[1]] += blk
                colc[si, kpos:kpos + kcb] = cs // CC + np.arange(kcb)
                kpos += kcb
    return vals, colc, rsA, rsB, G, steps, NC, nrows


def paired_kernel(cc_ref, rsA_ref, rsB_ref, x_ref, v_ref, y_ref, *, G, KC_,
                  prec):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for g in range(G):
        b = s * G + g
        parts = [x_ref[pl.ds(cc_ref[b, j] * CC, CC), :] for j in range(KC_)]
        xg = jnp.concatenate(parts, axis=0)
        yp = _slot_dot(v_ref[g], xg, prec)
        y_ref[pl.ds(rsA_ref[b], 64), :] += yp[:64]
        y_ref[pl.ds(rsB_ref[b], 64), :] += yp[64:]


def run_paired(layout, KCc_pair, roof_us, x_oracle, y_oracle):
    vals_np, colc, rsA, rsB, G, steps, NC, nrows = build_paired(
        layout, KCc_pair)
    nb = vals_np.shape[0]
    KP = KCc_pair * CC
    xrows = (NC + 1) * CC
    yrows = -(-(nrows + 64) // 64) * 64
    stream_mb = vals_np.nbytes / 1e6
    print(f"  paired: nb={nb} G={G} steps={steps} KP={KP} "
          f"vals={stream_mb:.1f} MB", flush=True)
    cc_j = jnp.asarray(colc)
    rsA_j = jnp.asarray(rsA)
    rsB_j = jnp.asarray(rsB)

    rng = np.random.default_rng(5)
    vals_set = [jnp.asarray(vals_np)]
    mask = vals_np != 0
    for i in range(1, PIPE):
        v2 = np.zeros_like(vals_np)
        v2[mask] = rng.standard_normal(int(mask.sum())).astype(np.float32)
        vals_set.append(jnp.asarray(v2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((xrows, R), lambda s, c, a, b: (0, 0)),
            pl.BlockSpec((G, 128, KP), lambda s, c, a, b: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((yrows, R), lambda s, c, a, b: (0, 0)),
    )
    call = pl.pallas_call(
        functools.partial(paired_kernel, G=G, KC_=KCc_pair, prec="highest"),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((yrows, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals_np.size * R, bytes_accessed=vals_np.nbytes,
            transcendentals=0),
    )

    def apply_fn(i, X):
        Xp = jnp.pad(X, ((0, xrows - X.shape[0]), (0, 0)))
        y = call(cc_j, rsA_j, rsB_j, Xp, vals_set[i])
        return y[:nrows]

    out = np.asarray(apply_fn(0, x_oracle))
    err = np.max(np.abs(out - y_oracle)) / max(1.0, np.max(np.abs(y_oracle)))
    print(f"  paired correctness: relerr {err:.2e}", flush=True)
    assert err < 1e-5
    measure(apply_fn, nrows, f"paired KCc={KCc_pair}", roof_us)


def main():
    import bench

    A = bench.build_config1()
    As = [A] + [bench.build_config1(value_seed=100 + i)
                for i in range(1, PIPE)]
    layout = A._layout
    nnz = A.nnz
    n = A.shape[0]
    roof_us = (nnz * 4 + 2 * n * R * 4) / BW * 1e6
    print(f"config4: roofline {roof_us:.1f} us", flush=True)

    # oracle
    rng = np.random.default_rng(1)
    Xo = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    Yo = np.asarray(A @ Xo)

    # -- 1. step sweep on the real plan ---------------------------------
    for G in (8, 16, 24, 32, 48):
        try:
            plan = build_patch_plan(layout, force_G=G)
        except ValueError as e:
            print(f"  [G={G}] rejected: {e}", flush=True)
            continue
        if plan is None:
            continue
        devs = [patch_device_arrays(build_patch_plan(Ai._layout, force_G=G))
                for Ai in As]
        plan_i = plan

        def apply_fn(i, X, plan_i=plan_i, devs=devs):
            return patch_spmm(plan_i, devs[i], X, precision="highest")

        b = plan.buckets[0]
        out = np.asarray(apply_fn(0, Xo))
        err = np.max(np.abs(out - Yo)) / max(1.0, np.max(np.abs(Yo)))
        assert err < 1e-5, err
        measure(apply_fn, n,
                f"G={b.G} steps={b.nb//b.G} MP={b.MP} KP={b.KP}", roof_us)

    # -- 2. paired slots -------------------------------------------------
    for KCc_pair in (12, 16):
        run_paired(layout, KCc_pair, roof_us, Xo, Yo)


if __name__ == "__main__":
    main()
