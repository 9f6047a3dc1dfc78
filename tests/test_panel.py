"""Panel engine tests: K-merged panel plans + kernel vs the scipy oracle.

Interpret-mode Pallas on CPU (the kernel-logic tier; the on-chip tier is
tests/test_tpu.py).  Mirrors the reference's oracle pattern
(/root/reference/test/test_blockmatrix.jl:33-82): build, convert, compare
products at tight tolerance -- plus the panel-specific contracts: padding
ratio actually drops vs the slab plan, mirror map-back drops diagonal
segments, scattered-column lists cost nothing.
"""

import numpy as np
import pytest

import blocksparse_tpu as bst
from blocksparse_tpu.core.panel import (
    build_panel_plan, panel_plan_from_layout, panel_plan_symmetric)
from blocksparse_tpu.ops.pallas.panel_spmv import (
    panel_apply, panel_device_arrays)
from blocksparse_tpu.utils.testmatrices import (
    random_block_sparse, random_symmetric, random_vbcrs)

RNG = np.random.default_rng(7)


def _plan_oracle(plan, A, rtol=3e-5):
    import jax.numpy as jnp

    S = bst.to_scipy(A)
    dev = panel_device_arrays(plan)
    x = RNG.standard_normal(A.shape[1]).astype(np.float32)
    y = np.asarray(panel_apply(plan, dev, jnp.asarray(x), interpret=True))
    ref = S @ x
    np.testing.assert_allclose(y, ref, rtol=rtol,
                               atol=rtol * max(1.0, np.abs(ref).max()))


def test_contiguous_block_sparse_oracle():
    blocks, rows, cols, shape = random_block_sparse(
        seed=11, shape=(600, 600), nblocks=30, max_block=60,
        dtype=np.float32, contiguous=True)
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    plan = panel_plan_from_layout(A._layout)
    assert plan is not None
    _plan_oracle(plan, A)


def test_scattered_columns_cost_their_seg_cover():
    """Scattered COLUMN lists embed at their 32-segment cover positions:
    correct for ANY list, and for locally clustered lists (the reference's
    BEM fixtures, SURVEY.md §4) the value stream stays within the cluster
    span's dilution -- far below the slab plan's whole-chunk cover."""
    rng = np.random.default_rng(3)
    n = 800
    blocks, rows, cols = [], [], []
    for i in range(12):
        r0 = 64 * i
        c0 = int(rng.integers(0, n - 64))
        blocks.append(rng.standard_normal((48, 48)).astype(np.float32))
        rows.append(np.arange(r0, r0 + 48))
        cols.append(c0 + np.sort(rng.choice(64, 48, replace=False)))
    A = bst.BlockSparseMatrix(blocks, rows, cols, (n, n))
    plan = panel_plan_from_layout(A._layout)
    assert plan is not None
    _plan_oracle(plan, A)
    # 48-of-64 clustered lists: cover <= 3 segs (96 lanes) per 48 logical
    coplan = panel_plan_from_layout(
        bst.BlockSparseMatrix(
            blocks, rows, [np.arange(48 * i, 48 * i + 48) for i in range(12)],
            (n, n))._layout)
    assert plan.tile_bytes <= 2 * coplan.tile_bytes


def test_locally_scattered_rows_embed():
    """Sorted, locally clustered row lists (the reference's BEM fixture
    shape, SURVEY.md §4) embed span-dense and stay correct."""
    rng = np.random.default_rng(5)
    n = 2048
    blocks, rows, cols = [], [], []
    for _ in range(10):
        r0 = int(rng.integers(0, n - 90))
        rows.append(r0 + np.sort(rng.choice(90, 64, replace=False)))
        cols.append(np.sort(rng.choice(n, 64, replace=False)))
        blocks.append(rng.standard_normal((64, 64)).astype(np.float32))
    A = bst.BlockSparseMatrix(blocks, rows, cols, (n, n))
    plan = panel_plan_from_layout(A._layout)
    assert plan is not None
    _plan_oracle(plan, A)


def test_pathologically_scattered_rows_rejected():
    rng = np.random.default_rng(6)
    n = 4096
    rows = [np.sort(rng.choice(n, 40, replace=False))]
    cols = [np.sort(rng.choice(n, 40, replace=False))]
    A = bst.BlockSparseMatrix(
        [rng.standard_normal((40, 40)).astype(np.float32)], rows, cols,
        (n, n))
    assert panel_plan_from_layout(A._layout) is None


def test_symmetric_fused_oracle():
    d, di, o, ri, ci, shp = random_symmetric(
        seed=13, n=700, ngroups=14, noffdiag=26, dtype=np.float32,
        contiguous=True)
    Sy = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shp)
    # the model-chosen plan (fused or expanded, whichever streams cheaper)
    plan = panel_plan_symmetric(Sy._dlayout, Sy._olayout)
    assert plan is not None
    _plan_oracle(plan, Sy)
    # ... and the FUSED one-read variant explicitly (mirror kernel path)
    from blocksparse_tpu.core.panel import _layout_entries, build_panel_plan

    entries = (_layout_entries(Sy._dlayout, transpose=False)
               + [(b, r, c, True) for b, r, c, _ in
                  _layout_entries(Sy._olayout, transpose=False)])
    plan = build_panel_plan(entries, Sy.shape, mirror=True)
    assert plan is not None and plan.mirror and plan.omap is not None
    _plan_oracle(plan, Sy)
    # S^T variant (diagonal transposes; off-diagonal pair is invariant,
    # symmetricblockmatrix.jl:219-237)
    planT = panel_plan_symmetric(Sy._dlayout, Sy._olayout,
                                 transpose_diag=True)
    import jax.numpy as jnp

    S = bst.to_scipy(Sy)
    x = RNG.standard_normal(shp[1]).astype(np.float32)
    y = np.asarray(panel_apply(planT, panel_device_arrays(planT),
                               jnp.asarray(x), interpret=True))
    ref = S.T @ x
    np.testing.assert_allclose(y, ref, rtol=3e-5,
                               atol=3e-5 * np.abs(ref).max())


def test_symmetric_diag_only():
    """No stored off-diagonals: the builder degrades to a plain plan."""
    d, di, o, ri, ci, shp = random_symmetric(
        seed=14, n=300, ngroups=6, noffdiag=0, dtype=np.float32,
        contiguous=True)
    Sy = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shp)
    plan = panel_plan_symmetric(Sy._dlayout, Sy._olayout)
    assert plan is not None and not plan.mirror
    _plan_oracle(plan, Sy)


def test_vbcrs_panels():
    blocks, rstarts, cstarts, shape = random_vbcrs(seed=15, dtype=np.float32)
    V = bst.VariableBlockCompressedRowStorage(blocks, rstarts, cstarts,
                                              shape)
    plan = panel_plan_from_layout(V._layout)
    assert plan is not None
    _plan_oracle(plan, V)
    # padding contract: the K-merged panels beat the slab plan's dilution
    from blocksparse_tpu.core.strip import plan_from_layout

    splan = plan_from_layout(V._layout)
    if splan is not None:
        assert plan.tile_bytes < splan.tile_bytes


def test_routing_uses_panel_when_cheaper():
    blocks, rstarts, cstarts, shape = random_vbcrs(seed=16, dtype=np.float32)
    V = bst.VariableBlockCompressedRowStorage(
        blocks, rstarts, cstarts, shape, backend="pallas-interpret")
    S = bst.to_scipy(V)
    x = RNG.standard_normal(shape[1]).astype(np.float32)
    y = np.asarray(V @ x)
    np.testing.assert_allclose(y, S @ x, rtol=3e-5,
                               atol=3e-5 * np.abs(S @ x).max())


def test_panel_grad_and_transpose():
    import jax
    import jax.numpy as jnp

    blocks, rows, cols, shape = random_block_sparse(
        seed=17, shape=(400, 400), nblocks=16, max_block=48,
        dtype=np.float32, contiguous=True)
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    S = bst.to_scipy(A)
    plan = panel_plan_from_layout(A._layout)
    dev = panel_device_arrays(plan)
    x = jnp.asarray(RNG.standard_normal(shape[1]).astype(np.float32))
    g = np.asarray(jax.grad(
        lambda v: jnp.sum(panel_apply(plan, dev, v, interpret=True) ** 2)
    )(x))
    y = S @ np.asarray(x)
    ref = 2 * (S.T @ y)
    np.testing.assert_allclose(g, ref, rtol=3e-4,
                               atol=3e-4 * np.abs(ref).max())
    # transpose plan
    planT = panel_plan_from_layout(A._layout, transpose=True)
    yT = np.asarray(panel_apply(planT, panel_device_arrays(planT), x,
                                interpret=True))
    refT = S.T @ np.asarray(x)
    np.testing.assert_allclose(yT, refT, rtol=3e-5,
                               atol=3e-5 * np.abs(refT).max())


def test_overlapping_mirror_ranges_supported():
    """Off-diagonal blocks with overlapping column ranges: the mirror
    map-back one-hot sums overlapping contributions (segment rows of
    y.reshape(-1, 32) accumulate in the matmul), so the plan exists and
    matches the oracle."""
    rng = np.random.default_rng(8)
    n = 256
    d = [rng.standard_normal((32, 32)).astype(np.float32)]
    di = [np.arange(0, 32)]
    o = [rng.standard_normal((32, 40)).astype(np.float32),
         rng.standard_normal((32, 40)).astype(np.float32)]
    ri = [np.arange(0, 32), np.arange(0, 32)]
    ci = [np.arange(64, 104), np.arange(80, 120)]
    Sy = bst.SymmetricBlockMatrix(d, di, o, ri, ci, (n, n))
    plan = panel_plan_symmetric(Sy._dlayout, Sy._olayout)
    assert plan is not None and plan.mirror
    _plan_oracle(plan, Sy)


def test_scattered_mirror_columns():
    """Scattered off-diagonal column lists work through the fused mirror
    (values embed at in-segment positions; the map-back is position-exact).
    The reference's BEM fixtures are exactly this shape (SURVEY.md §4)."""
    rng = np.random.default_rng(12)
    n = 512
    d = [rng.standard_normal((48, 48)).astype(np.float32)]
    di = [np.arange(0, 48)]
    o = [rng.standard_normal((48, 40)).astype(np.float32)]
    ri = [np.arange(0, 48)]
    ci = [64 + np.sort(rng.choice(96, 40, replace=False))]
    Sy = bst.SymmetricBlockMatrix(d, di, o, ri, ci, (n, n))
    # build the FUSED plan directly: the fused-vs-expanded cost model may
    # legitimately pick expanded here (mirror rate penalty 1.9, measured
    # round 4), but the property under test is the fused mirror map-back
    from blocksparse_tpu.core.panel import _layout_entries, build_panel_plan

    diag = _layout_entries(Sy._dlayout, transpose=False)
    off = _layout_entries(Sy._olayout, transpose=False)
    plan = build_panel_plan(
        diag + [(b, r, c, True) for b, r, c, _ in off], (n, n), mirror=True)
    assert plan is not None and plan.mirror
    _plan_oracle(plan, Sy)
    # the auto choice must also stay correct, whichever plan wins
    auto = panel_plan_symmetric(Sy._dlayout, Sy._olayout)
    assert auto is not None
    _plan_oracle(auto, Sy)


def test_overlapping_blocks_sum():
    rng = np.random.default_rng(9)
    b = [rng.standard_normal((16, 16)).astype(np.float32) for _ in range(2)]
    rows = [np.arange(8, 24), np.arange(8, 24)]
    cols = [np.arange(0, 16), np.arange(0, 16)]
    A = bst.BlockSparseMatrix(b, rows, cols, (64, 64))
    plan = panel_plan_from_layout(A._layout)
    assert plan is not None
    _plan_oracle(plan, A)


def test_shift_variant_choice_and_compaction():
    """The gather builds ONLY the grids the plan uses (compacted table),
    and the shift-vs-grid0 variants agree numerically (round 4:
    _best_shift_variant charges ~0.3 us/roll so op floors are not paid
    for marginal cover savings)."""
    from blocksparse_tpu.core.panel import (_best_shift_variant,
                                            _layout_entries,
                                            build_panel_plan)

    rng = np.random.default_rng(21)
    # arbitrary-offset contiguous blocks -> shifted grids are attractive
    n = 1024
    blocks = [rng.standard_normal((48, 60)).astype(np.float32)
              for _ in range(10)]
    rows = [np.arange(r, r + 48) for r in rng.integers(0, n - 48, 10)]
    cols = [np.arange(c, c + 60) for c in rng.integers(0, n - 60, 10)]
    A = bst.BlockSparseMatrix(blocks, rows, cols, (n, n))
    ent = _layout_entries(A._layout, transpose=False)
    ps = build_panel_plan(ent, (n, n))
    p0 = build_panel_plan(ent, (n, n), allow_shift=False)
    assert len(p0.grids_used) == 1 and p0.grids_used[0] == 0
    # compaction: every grid in the table is actually referenced
    NC32 = ps.NC32
    sent = len(ps.grids_used) * NC32
    ref_grids = {int(v) // NC32 for v in ps.segid.reshape(-1) if v < sent}
    assert ref_grids == set(range(len(ps.grids_used)))
    _plan_oracle(ps, A)
    _plan_oracle(p0, A)
    auto = _best_shift_variant(ent, (n, n), mirror=False, TS_max=1024)
    _plan_oracle(auto, A)
