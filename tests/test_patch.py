"""Patch-merged layout + engine vs dense oracle (f32 tolerances).

The patch plan re-tiles contiguous-range block populations into ragged
row-window merged slots (core/patch.py).  Oracle pattern follows the
reference tests (test_blockmatrix.jl:33-82) at f32 tolerance.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from blocksparse_tpu.core.layout import build_layout
from blocksparse_tpu.core.patch import CC, CR, build_patch_plan
from blocksparse_tpu.ops.patch_engine import (
    patch_apply, patch_device_arrays, patch_spmm, patch_spmm_xla, patch_spmv,
    patch_spmv_kernel,
)

TOL = 2e-5


def random_population(seed, n=1024, nblocks=40, wmin=9, wmax=120,
                      shared_rows=True):
    """Contiguous-range blocks, BEM-like mixed sizes; returns lists + dense."""
    rng = np.random.default_rng(seed)
    blocks, rows, cols = [], [], []
    dense = np.zeros((n, n), np.float32)
    # a handful of row groups so the merge has something to merge
    starts = np.sort(rng.choice(n - wmax - 1, size=12, replace=False))
    # one height per row group: blocks sharing a row range share its height
    # (the realistic structure: BEM tree leaves / VBCRS block rows)
    heights = rng.integers(wmin, wmax, size=len(starts))
    for _ in range(nblocks):
        w = int(rng.integers(wmin, wmax))
        if shared_rows:
            gi = int(rng.integers(len(starts)))
            rs = int(starts[gi])
            h = int(min(heights[gi], n - rs))
        else:
            h = int(rng.integers(wmin, wmax))
            rs = int(rng.integers(0, n - h))
        cs = int(rng.integers(0, n - w))
        b = rng.standard_normal((h, w)).astype(np.float32)
        blocks.append(b)
        rows.append(np.arange(rs, rs + h))
        cols.append(np.arange(cs, cs + w))
        dense[rs:rs + h, cs:cs + w] += b
    return blocks, rows, cols, dense


def build(seed=0, **kw):
    blocks, rows, cols, dense = random_population(seed, **kw)
    n = dense.shape[0]
    layout = build_layout(blocks, rows, cols, (n, n), granularity="pow2",
                          dtype=np.float32)
    plan = build_patch_plan(layout)
    return layout, plan, dense


def test_plan_stats():
    """On BASELINE-like populations (widths 16-128) the canvas pads less
    than pow2 bucketing; dispatch chooses by cost so pathological tiny-width
    populations simply stay on the bucket engines."""
    layout, plan, dense = build(0, wmin=24, wmax=120)
    assert plan is not None
    rho_patch = plan.padded_nnz / plan.logical_nnz
    rho_pow2 = layout.padded_nnz / layout.nnz
    assert rho_patch < rho_pow2
    assert rho_patch < 2.0
    assert len(plan.buckets) == 1  # uniform canvas: one bucket always
    for b in plan.buckets:
        assert b.KP % 128 == 0
        assert b.MP % CR == 0
        assert b.nb % b.G == 0


def test_spmv_oracle():
    _, plan, dense = build(1)
    dev = patch_device_arrays(plan)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(dense.shape[1]).astype(np.float32)
    y = np.asarray(patch_spmv(plan, dev, jnp.asarray(x)))
    ref = dense @ x
    assert np.abs(y - ref).max() <= TOL * max(np.abs(ref).max(), 1)
    # transpose role swap
    yt = np.asarray(patch_spmv(plan, dev, jnp.asarray(x), transpose=True))
    reft = dense.T @ x
    assert np.abs(yt - reft).max() <= TOL * max(np.abs(reft).max(), 1)


def test_spmv_rectangular():
    """Rectangular operands: x fits only the buffer its branch gathers
    from (ADVICE r3 medium: a 16x1024 forward SpMV used to crash on the
    unconditional row-grid reshape)."""
    rng = np.random.default_rng(7)
    m, n = 16, 1024
    dense = np.zeros((m, n), np.float32)
    blocks, rows, cols = [], [], []
    for cs in (0, 256, 640):
        b = rng.standard_normal((m, 128)).astype(np.float32)
        blocks.append(b)
        rows.append(np.arange(m))
        cols.append(np.arange(cs, cs + 128))
        dense[:, cs:cs + 128] += b
    layout = build_layout(blocks, rows, cols, (m, n), granularity="pow2",
                          dtype=np.float32)
    plan = build_patch_plan(layout)
    assert plan is not None
    dev = patch_device_arrays(plan)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(patch_spmv(plan, dev, jnp.asarray(x)))
    ref = dense @ x
    assert np.abs(y - ref).max() <= TOL * max(np.abs(ref).max(), 1)
    xt = rng.standard_normal(m).astype(np.float32)
    yt = np.asarray(patch_spmv(plan, dev, jnp.asarray(xt), transpose=True))
    reft = dense.T @ xt
    assert np.abs(yt - reft).max() <= TOL * max(np.abs(reft).max(), 1)
    # the kernel wrapper takes the same lazy-reshape path
    from blocksparse_tpu.ops.patch_engine import patch_kernel_ok

    if patch_kernel_ok(plan):
        yk = np.asarray(patch_spmv_kernel(plan, dev, jnp.asarray(x),
                                          interpret=True))
        assert np.abs(yk - ref).max() <= TOL * max(np.abs(ref).max(), 1)


def test_spmv_scattered_rejected():
    rng = np.random.default_rng(5)
    blocks = [rng.standard_normal((4, 4)).astype(np.float32)]
    rows = [np.array([1, 3, 7, 9])]
    cols = [np.arange(4)]
    layout = build_layout(blocks, rows, cols, (16, 16), dtype=np.float32)
    assert build_patch_plan(layout) is None


def test_spmm_xla_oracle():
    _, plan, dense = build(2)
    dev = patch_device_arrays(plan)
    rng = np.random.default_rng(4)
    X = rng.standard_normal((dense.shape[1], 16)).astype(np.float32)
    Y = np.asarray(patch_spmm_xla(plan, dev, jnp.asarray(X)))
    ref = dense @ X
    assert np.abs(Y - ref).max() <= TOL * max(np.abs(ref).max(), 1)
    Yt = np.asarray(patch_spmm_xla(plan, dev, jnp.asarray(X), transpose=True))
    reft = dense.T @ X
    assert np.abs(Yt - reft).max() <= TOL * max(np.abs(reft).max(), 1)


def test_spmm_kernel_interpret():
    _, plan, dense = build(6, n=512, nblocks=16)
    dev = patch_device_arrays(plan)
    rng = np.random.default_rng(7)
    X = rng.standard_normal((dense.shape[1], 8)).astype(np.float32)
    Y = np.asarray(patch_spmm(plan, dev, jnp.asarray(X), interpret=True))
    ref = dense @ X
    assert np.abs(Y - ref).max() <= TOL * max(np.abs(ref).max(), 1)
    Yt = np.asarray(patch_spmm(plan, dev, jnp.asarray(X), transpose=True,
                               interpret=True))
    reft = dense.T @ X
    assert np.abs(Yt - reft).max() <= TOL * max(np.abs(reft).max(), 1)


def symmetric_population(seed, n=768):
    """Diag blocks on group ranges + off-diagonal blocks stored once."""
    rng = np.random.default_rng(seed)
    bounds = np.unique(np.concatenate([[0],
                                       np.sort(rng.choice(n, 7, replace=False)),
                                       [n]]))
    groups = [np.arange(bounds[i], bounds[i + 1])
              for i in range(len(bounds) - 1) if bounds[i + 1] > bounds[i]]
    dblocks, dri, dci = [], [], []
    oblocks, ori, oci = [], [], []
    dense = np.zeros((n, n), np.float32)
    for g in groups:
        b = rng.standard_normal((g.size, g.size)).astype(np.float32)
        dblocks.append(b)
        dri.append(g)
        dci.append(g)
        dense[np.ix_(g, g)] += b
    for _ in range(10):
        gi, gj = rng.choice(len(groups), 2, replace=False)
        gi, gj = int(gi), int(gj)
        b = rng.standard_normal((groups[gi].size,
                                 groups[gj].size)).astype(np.float32)
        oblocks.append(b)
        ori.append(groups[gi])
        oci.append(groups[gj])
        dense[np.ix_(groups[gi], groups[gj])] += b
        dense[np.ix_(groups[gj], groups[gi])] += b.T
    dlay = build_layout(dblocks, dri, dci, (n, n), dtype=np.float32)
    olay = build_layout(oblocks, ori, oci, (n, n), dtype=np.float32)
    return dlay, olay, dense


def test_symmetric_fused():
    dlay, olay, dense = symmetric_population(11)
    plan = build_patch_plan(dlay, extra_layout=olay)
    assert plan is not None and plan.symmetric
    dev = patch_device_arrays(plan)
    rng = np.random.default_rng(12)
    x = rng.standard_normal(dense.shape[0]).astype(np.float32)
    y = np.asarray(patch_spmv(plan, dev, jnp.asarray(x)))
    ref = dense @ x
    assert np.abs(y - ref).max() <= TOL * max(np.abs(ref).max(), 1)
    # SpMM, XLA fallback and interpret kernel
    X = rng.standard_normal((dense.shape[0], 8)).astype(np.float32)
    refm = dense @ X
    Y1 = np.asarray(patch_spmm_xla(plan, dev, jnp.asarray(X)))
    assert np.abs(Y1 - refm).max() <= TOL * max(np.abs(refm).max(), 1)
    Y2 = np.asarray(patch_spmm(plan, dev, jnp.asarray(X), interpret=True))
    assert np.abs(Y2 - refm).max() <= TOL * max(np.abs(refm).max(), 1)


def test_spmv_grad():
    _, plan, dense = build(8, n=512, nblocks=12)
    dev = patch_device_arrays(plan)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal(dense.shape[1]).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(dense.shape[0]).astype(np.float32))

    def f(xv):
        return jnp.vdot(w, patch_spmv(plan, dev, xv))

    g = np.asarray(jax.grad(f)(x))
    ref = dense.T @ np.asarray(w)
    assert np.abs(g - ref).max() <= TOL * max(np.abs(ref).max(), 1)


def test_spmm_kernel_grad_interpret():
    _, plan, dense = build(10, n=512, nblocks=10)
    dev = patch_device_arrays(plan)
    rng = np.random.default_rng(13)
    X = jnp.asarray(rng.standard_normal((dense.shape[1], 8)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((dense.shape[0], 8)).astype(np.float32))

    def f(Xv):
        return jnp.vdot(W, patch_spmm(plan, dev, Xv, interpret=True))

    g = np.asarray(jax.grad(f)(X))
    ref = dense.T @ np.asarray(W)
    assert np.abs(g - ref).max() <= 5 * TOL * max(np.abs(ref).max(), 1)


def test_spmv_kernel_interpret():
    """One-read r=1 kernel (interpret) vs dense oracle, plain + symmetric."""
    _, plan, dense = build(14, n=512, nblocks=14)
    dev = patch_device_arrays(plan)
    rng = np.random.default_rng(15)
    x = rng.standard_normal(dense.shape[1]).astype(np.float32)
    y = np.asarray(patch_spmv_kernel(plan, dev, jnp.asarray(x),
                                     interpret=True))
    ref = dense @ x
    assert np.abs(y - ref).max() <= TOL * max(np.abs(ref).max(), 1)

    dlay, olay, sdense = symmetric_population(16, n=512)
    splan = build_patch_plan(dlay, extra_layout=olay)
    sdev = patch_device_arrays(splan)
    xs = rng.standard_normal(512).astype(np.float32)
    ys = np.asarray(patch_spmv_kernel(splan, sdev, jnp.asarray(xs),
                                      interpret=True))
    refs = sdense @ xs
    assert np.abs(ys - refs).max() <= TOL * max(np.abs(refs).max(), 1)


def test_spmv_kernel_grad_interpret():
    dlay, olay, sdense = symmetric_population(17, n=384)
    splan = build_patch_plan(dlay, extra_layout=olay)
    sdev = patch_device_arrays(splan)
    rng = np.random.default_rng(18)
    x = jnp.asarray(rng.standard_normal(384).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(384).astype(np.float32))

    def f(xv):
        return jnp.vdot(w, patch_spmv_kernel(splan, sdev, xv,
                                             interpret=True))

    g = np.asarray(jax.grad(f)(x))
    ref = sdense.T @ np.asarray(w)
    assert np.abs(g - ref).max() <= 5 * TOL * max(np.abs(ref).max(), 1)


def test_population_policy_resolution():
    """auto_policy consults the per-population winner ahead of env/default
    (VERDICT r2 weak #8)."""
    from blocksparse_tpu.ops.dispatch import (
        _MEASURED_DEFAULT, _POPULATION_POLICY, auto_policy,
        set_population_policy)

    layout, _, _ = build(21, n=256, nblocks=6)
    try:
        other = _MEASURED_DEFAULT["spmv"]
        winner = "pallas" if other == "xla" else "xla"
        assert auto_policy("spmv", layout) == other
        set_population_policy(layout, "spmv", winner)
        assert auto_policy("spmv", layout) == winner
        # a different population still sees the default
        layout2, _, _ = build(22, n=256, nblocks=5)
        assert auto_policy("spmv", layout2) == other
    finally:
        _POPULATION_POLICY.clear()


def test_autotune_stores_report_off_tpu():
    """autotune_backend raises off-TPU (measurement needs the chip); the
    registry plumbing it feeds is covered above."""
    import jax
    import pytest as _pytest

    import blocksparse_tpu as bst
    from blocksparse_tpu.utils.autotune import autotune_backend

    if jax.default_backend() == "tpu":
        _pytest.skip("covered by the on-chip tier")
    rng = np.random.default_rng(0)
    A = bst.BlockSparseMatrix(
        [rng.standard_normal((8, 8)).astype(np.float32)],
        [np.arange(8)], [np.arange(8)], (16, 16))
    with _pytest.raises(RuntimeError):
        autotune_backend(A)


def test_even_step_auto_plan():
    """auto/latency plans pick an EVEN grid-step count (measured DMA
    double-buffer parity, benchmarks/proto_r5_spmm2.py); throughput
    restores the padded-bytes search."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench  # repo-root fixture builders

    A = bench.build_config1()
    for opt in (None, "auto", "latency"):
        p = build_patch_plan(A._layout, optimize=opt)
        b = p.buckets[0]
        steps = b.nb // b.G
        assert steps % 2 == 0 and steps <= 8, (opt, steps)
        assert b.G % 8 == 0
    pt = build_patch_plan(A._layout, optimize="throughput")
    bt = pt.buckets[0]
    # the throughput search minimizes padded bytes: no even-step constraint
    assert bt.nb >= bt.G


def test_autotune_optimize_guards():
    """autotune_optimize refuses non-square operators and non-TPU backends
    with actionable errors."""
    import blocksparse_tpu as bst

    from blocksparse_tpu.utils.autotune import autotune_optimize
    from blocksparse_tpu.utils.testmatrices import random_block_sparse

    blocks, rows, cols, shape = random_block_sparse(
        83, shape=(96, 128), nblocks=4, max_block=16, dtype=np.float32,
        contiguous=True,
    )
    R = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    with pytest.raises(ValueError, match="square"):
        autotune_optimize(R)
    blocks, rows, cols, shape = random_block_sparse(
        84, shape=(128, 128), nblocks=4, max_block=16, dtype=np.float32,
        contiguous=True,
    )
    S = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    with pytest.raises(RuntimeError, match="TPU"):
        autotune_optimize(S)  # CPU test backend
