"""Round-4 probe: u64 engine — single-launch SpMV/SpMM for 64-aligned
uniform 64x64 block populations (bench config1/config4 class).

Design under test (the anti-fixed-cost design: ZERO outside gather or
scatter ops):

  - blocks stored TRANSPOSED, two per slot: vals[b] = [B0^T | B1^T]
    ([64 k-sublanes, 128 m-lanes]) so every contraction is the
    contract-dim-0 MXU pattern (sublane-major both operands, no
    relayout -- panel2_spmv._ohdot precedent);
  - r=1: slots pair blocks sharing a COLUMN chunk; one dot
    dg0(x[64c:64c+64,None], V) -> [1,128] covers both halves; rows
    accumulate in a VMEM scratch [nb, 128]; the LAST grid step scatters
    with two in-kernel one-hot dots dg0(WOH_h, scr[:, 64h:64h+64])
    -> y64 [W, 64].  The whole product is ONE pallas_call.
  - SpMM: slots pair blocks sharing a row WINDOW; two dots
    dg0(V[:, 64h:], X[64ch:64ch+64, :]) -> [64, R] accumulate straight
    into y[w:w+64, :] (dynamic sublane store).

Risk probed: MXU issue cost of many small dots (r=1 does ~100 dots of
M=1).

Run: python benchmarks/proto_r4_u64.py
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

from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BW = 819e9
BS = 64
PIPE = 4


def dg0(a, b):
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=HI)


def extract_blocks(layout):
    """[(w, c, block f32)] for 64-aligned uniform blocks."""
    out = []
    for i in range(layout.nblocks):
        r = layout.rowindices[i]
        c = layout.colindices[i]
        assert r.size == BS and c.size == BS
        assert r[0] % BS == 0 and c[0] % BS == 0
        out.append((int(r[0]) // BS, int(c[0]) // BS,
                    np.asarray(layout.extract_block(i), np.float32)))
    return out


def build_col_pairs(blocks, n, G=8):
    """Pair-by-column plan for r=1: vals [nb,64,128], ctab [nb],
    WOH0/WOH1 [nb, W] (zero row = sentinel)."""
    W = n // BS
    byc: dict = {}
    for w, c, b in blocks:
        byc.setdefault(c, []).append((w, b))
    slots = []
    for c in sorted(byc):
        mem = byc[c]
        for i in range(0, len(mem), 2):
            pair = mem[i:i + 2]
            slots.append((c, pair))
    nb = -(-len(slots) // G) * G
    vals = np.zeros((nb, BS, 2 * BS), np.float32)
    ctab = np.zeros((nb,), np.int32)
    woh = np.zeros((2, nb, W), np.float32)
    for si, (c, pair) in enumerate(slots):
        ctab[si] = c
        for h, (w, b) in enumerate(pair):
            vals[si, :, h * BS:(h + 1) * BS] = b.T
            woh[h, si, w] = 1.0
    return vals, ctab, woh[0], woh[1], len(slots)


def build_win_pairs(blocks, n, G=8):
    """Pair-by-window plan for SpMM: vals [nb,64,128], wtab/c0/c1 [nb]."""
    byw: dict = {}
    for w, c, b in blocks:
        byw.setdefault(w, []).append((c, b))
    slots = []
    for w in sorted(byw):
        mem = byw[w]
        for i in range(0, len(mem), 2):
            slots.append((w, mem[i:i + 2]))
    nb = -(-len(slots) // G) * G
    vals = np.zeros((nb, BS, 2 * BS), np.float32)
    wtab = np.full((nb,), n // BS, np.int32)   # sentinel pad window
    cts = np.zeros((2, nb), np.int32)
    for si, (w, pair) in enumerate(slots):
        wtab[si] = w
        for h, (c, b) in enumerate(pair):
            vals[si, :, h * BS:(h + 1) * BS] = b.T
            cts[h, si] = c
    return vals, wtab, cts[0], cts[1], len(slots)


# -- r=1 kernel ---------------------------------------------------------------


def _kern1(c_ref, v_ref, x_ref, w0_ref, w1_ref, y_ref, scr, *, G, steps):
    s = pl.program_id(0)
    for g in range(G):
        b = s * G + g
        xk = x_ref[pl.ds(c_ref[b] * BS, BS), :]          # [64, 1]
        scr[pl.ds(b, 1), :] = dg0(xk, v_ref[g])          # [1, 128]

    @pl.when(s == steps - 1)
    def _():
        y_ref[:] = (dg0(w0_ref[:], scr[:, :BS])
                    + dg0(w1_ref[:], scr[:, BS:]))


def u64_spmv(vals, ctab, woh0, woh1, n, G, interpret=False):
    nb = vals.shape[0]
    steps = nb // G
    W = n // BS
    call = pl.pallas_call(
        functools.partial(_kern1, G=G, steps=steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((G, BS, 2 * BS), lambda s, c: (s, 0, 0)),
                pl.BlockSpec((n, 1), lambda s, c: (0, 0)),
                pl.BlockSpec((nb, W), lambda s, c: (0, 0)),
                pl.BlockSpec((nb, W), lambda s, c: (0, 0)),
            ],
            out_specs=pl.BlockSpec((W, BS), lambda s, c: (0, 0)),
            scratch_shapes=[pltpu.VMEM((nb, 2 * BS), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((W, BS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size, bytes_accessed=vals.size * 4,
            transcendentals=0),
        interpret=interpret,
    )

    def apply(x):
        y64 = call(ctab, vals, x.reshape(n, 1), woh0, woh1)
        return y64.reshape(n)

    return apply


# -- SpMM kernel --------------------------------------------------------------


def _kernM(w_ref, c0_ref, c1_ref, v_ref, x_ref, y_ref, *, G, R):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for g in range(G):
        b = s * G + g
        V = v_ref[g]
        p = dg0(V[:, :BS], x_ref[pl.ds(c0_ref[b] * BS, BS), :])
        p = p + dg0(V[:, BS:], x_ref[pl.ds(c1_ref[b] * BS, BS), :])
        y_ref[pl.ds(w_ref[b] * BS, BS), :] += p


def u64_spmm(vals, wtab, c0, c1, n, R, G, interpret=False):
    nb = vals.shape[0]
    steps = nb // G
    yrows = n + BS   # sentinel window
    call = pl.pallas_call(
        functools.partial(_kernM, G=G, R=R),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((G, BS, 2 * BS), lambda s, w, a, b: (s, 0, 0)),
                pl.BlockSpec((n, R), lambda s, w, a, b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((yrows, R), lambda s, w, a, b: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((yrows, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size * R,
            bytes_accessed=vals.size * 4 + 2 * n * R * 4,
            transcendentals=0),
        interpret=interpret,
    )

    def apply(X):
        return call(wtab, c0, c1, vals, X)[:n]

    return apply


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    A = bench.build_config1()
    n = A.shape[0]
    nnz = A.nnz
    blocks = extract_blocks(A._layout)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    Xp = jnp.asarray(rng.standard_normal((n, PIPE)).astype(np.float32))
    ref1 = np.asarray(A @ x)
    roof1 = (nnz * 4 + 2 * n * 4) / BW * 1e6

    # -- r=1 --------------------------------------------------------------
    for G in (8, 16, 32):
        vals, ctab, woh0, woh1, ns = build_col_pairs(blocks, n, G=G)
        ap = u64_spmv(jnp.asarray(vals), jnp.asarray(ctab),
                      jnp.asarray(woh0), jnp.asarray(woh1), n, G)
        y = np.asarray(ap(x))
        err = np.abs(y - ref1).max() / np.abs(ref1).max()
        st = chained_time_per_iter(lambda v: ap(v) * 1e-3, x,
                                   iters_lo=10, iters_hi=60, repeats=5,
                                   reduce="stats")
        us = st["median"] * 1e6

        def piped(Xc):
            cols = [ap(Xc[:, i]) for i in range(PIPE)]
            return jnp.stack(cols, axis=1) * 1e-3

        sp = chained_time_per_iter(piped, Xp, iters_lo=5, iters_hi=30,
                                   repeats=5, reduce="stats")
        pus = sp["median"] * 1e6 / PIPE
        print(f"[r=1] G={G:2d} nslots={ns} nb={vals.shape[0]} "
              f"ratio={vals.size/nnz:.2f}: dep {us:.1f} us "
              f"({100*roof1/us:.1f}%) | piped {pus:.1f} us "
              f"({100*roof1/pus:.1f}%) err={err:.1e}", flush=True)

    # -- SpMM r=128 -------------------------------------------------------
    R = 128
    X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    XpM = jnp.asarray(rng.standard_normal((n, R * PIPE)).astype(np.float32))
    refM = np.asarray(A @ X)
    roofM = (nnz * 4 + 2 * n * R * 4) / BW * 1e6
    for G in (8, 16, 32):
        vals, wtab, c0, c1, ns = build_win_pairs(blocks, n, G=G)
        ap = u64_spmm(jnp.asarray(vals), jnp.asarray(wtab), jnp.asarray(c0),
                      jnp.asarray(c1), n, R, G)
        y = np.asarray(ap(X))
        err = np.abs(y - refM).max() / np.abs(refM).max()
        st = chained_time_per_iter(lambda V: ap(V) * 1e-3, X,
                                   iters_lo=5, iters_hi=25, repeats=5,
                                   reduce="stats")
        us = st["median"] * 1e6

        def pipedM(Xc):
            parts = [ap(Xc[:, i * R:(i + 1) * R]) for i in range(PIPE)]
            return jnp.concatenate(parts, axis=1) * 1e-3

        sp = chained_time_per_iter(pipedM, XpM, iters_lo=3, iters_hi=10,
                                   repeats=5, reduce="stats")
        pus = sp["median"] * 1e6 / PIPE
        print(f"[spmm] G={G:2d} nslots={ns} nb={vals.shape[0]} "
              f"ratio={vals.size/nnz:.2f}: dep {us:.1f} us "
              f"({100*roofM/us:.1f}%) | piped {pus:.1f} us "
              f"({100*roofM/pus:.1f}%) err={err:.1e}", flush=True)




# =====================================================================
# Variant 2 (u64v): VPU sublane-reduce contraction, arbitrary pairing
# (prefer same column), scratch rows + final one-hot dg0 scatters.
# Per-slot: 2 dyn sublane slices + 2 half-[64,64] mul+sublane-reduce +
# 2 static half-lane stores -> ~44 vops < 37-cyc stream budget/slot.
# =====================================================================


def build_pairs_v(blocks, n, G=8):
    byc: dict = {}
    for w, c, b in blocks:
        byc.setdefault(c, []).append((w, b))
    halves = []   # (c, w, block)
    singles = []
    for c in sorted(byc):
        mem = byc[c]
        for i in range(0, len(mem) - 1, 2):
            halves.append(((c, mem[i]), (c, mem[i + 1])))
        if len(mem) % 2:
            singles.append((c, mem[-1]))
    for i in range(0, len(singles) - 1, 2):
        halves.append((singles[i], singles[i + 1]))
    if len(singles) % 2:
        halves.append((singles[-1], None))
    W = n // BS
    nb = -(-len(halves) // G) * G
    vals = np.zeros((nb, BS, 2 * BS), np.float32)
    cts = np.zeros((2, nb), np.int32)
    woh = np.zeros((2, nb, W), np.float32)
    for si, pair in enumerate(halves):
        for h, ent in enumerate(pair if pair[1] is not None else pair[:1]):
            c, (w, b) = ent
            vals[si, :, h * BS:(h + 1) * BS] = b.T
            cts[h, si] = c
            woh[h, si, w] = 1.0
    return vals, cts[0], cts[1], woh[0], woh[1], len(halves)


def _kernV(c0_ref, c1_ref, v_ref, x_ref, w0_ref, w1_ref, y_ref, scr,
           *, G, steps):
    s = pl.program_id(0)
    for g in range(G):
        b = s * G + g
        V = v_ref[g]
        xk0 = x_ref[pl.ds(c0_ref[b] * BS, BS), :]       # [64, 1]
        xk1 = x_ref[pl.ds(c1_ref[b] * BS, BS), :]
        r0 = jnp.sum(V[:, :BS] * xk0, axis=0, keepdims=True)   # [1, 64]
        r1 = jnp.sum(V[:, BS:] * xk1, axis=0, keepdims=True)
        scr[pl.ds(b, 1), :BS] = r0
        scr[pl.ds(b, 1), BS:] = r1

    @pl.when(s == steps - 1)
    def _():
        y_ref[:] = (dg0(w0_ref[:], scr[:, :BS])
                    + dg0(w1_ref[:], scr[:, BS:]))


def u64v_spmv(vals, c0, c1, woh0, woh1, n, G, interpret=False):
    nb = vals.shape[0]
    steps = nb // G
    W = n // BS
    call = pl.pallas_call(
        functools.partial(_kernV, G=G, steps=steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((G, BS, 2 * BS), lambda s, a, b: (s, 0, 0)),
                pl.BlockSpec((n, 1), lambda s, a, b: (0, 0)),
                pl.BlockSpec((nb, W), lambda s, a, b: (0, 0)),
                pl.BlockSpec((nb, W), lambda s, a, b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((W, BS), lambda s, a, b: (0, 0)),
            scratch_shapes=[pltpu.VMEM((nb, 2 * BS), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((W, BS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size, bytes_accessed=vals.size * 4,
            transcendentals=0),
        interpret=interpret,
    )

    def apply(x):
        return call(c0, c1, vals, x.reshape(n, 1), woh0, woh1).reshape(n)

    return apply


def main_v():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    A = bench.build_config1()
    n = A.shape[0]
    nnz = A.nnz
    blocks = extract_blocks(A._layout)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    Xp = jnp.asarray(rng.standard_normal((n, PIPE)).astype(np.float32))
    ref1 = np.asarray(A @ x)
    roof1 = (nnz * 4 + 2 * n * 4) / BW * 1e6
    for G in (8, 16, 32):
        vals, c0, c1, woh0, woh1, ns = build_pairs_v(blocks, n, G=G)
        ap = u64v_spmv(jnp.asarray(vals), jnp.asarray(c0), jnp.asarray(c1),
                       jnp.asarray(woh0), jnp.asarray(woh1), n, G)
        y = np.asarray(ap(x))
        err = np.abs(y - ref1).max() / np.abs(ref1).max()
        st = chained_time_per_iter(lambda v: ap(v) * 1e-3, x,
                                   iters_lo=10, iters_hi=60, repeats=5,
                                   reduce="stats")
        us = st["median"] * 1e6

        def piped(Xc):
            cols = [ap(Xc[:, i]) for i in range(PIPE)]
            return jnp.stack(cols, axis=1) * 1e-3

        sp = chained_time_per_iter(piped, Xp, iters_lo=5, iters_hi=30,
                                   repeats=5, reduce="stats")
        pus = sp["median"] * 1e6 / PIPE
        print(f"[r=1 VPU] G={G:2d} nslots={ns} nb={vals.shape[0]} "
              f"ratio={vals.size/nnz:.2f}: dep {us:.1f} us "
              f"({100*roof1/us:.1f}%) | piped {pus:.1f} us "
              f"({100*roof1/pus:.1f}%) err={err:.1e}", flush=True)


if __name__ == "__main__":
    if "--vpu" in sys.argv:
        main_v()
    else:
        main()
