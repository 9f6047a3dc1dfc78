"""Panel v2 engine tests: SEG-parametric plans + kernels vs scipy oracle.

Interpret-mode Pallas on CPU (kernel-logic tier; on-chip tier is
tests/test_tpu.py).  Oracle pattern as in the reference
(/root/reference/test/test_blockmatrix.jl:33-82), plus the v2-specific
contracts: greedy covers handle unsorted/scattered lists, the fused mirror
path (one value read per stored off-diagonal,
symmetricblockmatrix.jl:394-418) matches the oracle at every SEG, the
mono (gather-in-kernel) path matches the outside-gather path, and the
custom VJP yields exact cotangents.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

import blocksparse_tpu as bst
from blocksparse_tpu.core.layout import build_layout
from blocksparse_tpu.core.panel2 import (
    build_panel2_plan, choose_seg, greedy_cover, panel2_plan_from_layout,
    panel2_plan_symmetric, _layout_entries)
from blocksparse_tpu.ops.pallas.panel2_spmv import (
    panel2_apply, panel2_device_arrays, _meta, _xla_forward)
from blocksparse_tpu.utils.testmatrices import (
    random_block_sparse, random_symmetric)

RNG = np.random.default_rng(7)
TOL = 3e-5


def _oracle(plan, S, n, rtol=TOL):
    dev = panel2_device_arrays(plan)
    x = RNG.standard_normal(n).astype(np.float32)
    y = np.asarray(panel2_apply(plan, dev, jnp.asarray(x), interpret=True))
    ref = S @ x
    np.testing.assert_allclose(y, ref, rtol=rtol,
                               atol=rtol * max(1.0, np.abs(ref).max()))
    # the XLA forward (VJP primal) must agree too
    yx = np.asarray(_xla_forward(dev, jnp.asarray(x), _meta(plan)))
    np.testing.assert_allclose(yx, ref, rtol=rtol,
                               atol=rtol * max(1.0, np.abs(ref).max()))


def test_greedy_cover_contract():
    """Cover windows are 0-aligned SEG-wide rows of x.reshape(-1, seg)
    and every column's lane position points back at it, for unsorted
    lists too."""
    rng = np.random.default_rng(3)
    for seg in (8, 16, 32):
        cols = np.unique(rng.choice(500, 60))
        rng.shuffle(cols)
        wins, lanes = greedy_cover(cols, seg)
        assert (wins % seg == 0).all()
        for c, lp in zip(cols, lanes):
            w = wins[lp // seg]
            assert w <= c < w + seg
            assert c - w == lp % seg


def _clustered_fixture(seed, n=600, nb=25, bs=40):
    """Sorted-but-scattered clustered index lists (the reference BEM
    statistics, SURVEY §4) with unsorted order, within the panel row
    dilution cap."""
    rng = np.random.default_rng(seed)
    span = int(bs * 1.3)
    blocks, rows, cols = [], [], []
    for _ in range(nb):
        blocks.append(rng.standard_normal((bs, bs)).astype(np.float32))
        rb = int(rng.integers(0, n - span))
        cb = int(rng.integers(0, n - span))
        ri = rb + rng.choice(span, bs, replace=False)
        ci = cb + rng.choice(span, bs, replace=False)
        rows.append(ri)
        cols.append(ci)
    return blocks, rows, cols, (n, n)


@pytest.mark.parametrize("seg", [8, 16, 32])
@pytest.mark.parametrize("contiguous", [True, False])
def test_block_sparse_oracle(seg, contiguous):
    if contiguous:
        blocks, rows, cols, shape = random_block_sparse(
            seed=21 + seg, shape=(600, 600), nblocks=25, max_block=60,
            dtype=np.float32, contiguous=True)
    else:
        blocks, rows, cols, shape = _clustered_fixture(21 + seg)
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    entries = _layout_entries(A._layout, transpose=False)
    plan = build_panel2_plan(entries, shape, seg=seg)
    assert plan is not None
    _oracle(plan, bst.to_scipy(A), shape[1])


@pytest.mark.parametrize("seg", [8, 16, 32])
def test_symmetric_fused_oracle(seg):
    d, di, o, ri, ci, shape = random_symmetric(
        31 + seg, n=800, ngroups=10, noffdiag=24, dtype=np.float32,
        contiguous=True)
    S_op = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape)
    diag = _layout_entries(S_op._dlayout, transpose=False)
    off = _layout_entries(S_op._olayout, transpose=False)
    plan = build_panel2_plan(
        diag + [(b, r, c, True) for b, r, c, _ in off], shape,
        seg=seg, mirror=True)
    assert plan is not None and plan.mirror
    _oracle(plan, bst.to_scipy(S_op), shape[0])


def test_symmetric_chooser_vs_oracle():
    d, di, o, ri, ci, shape = random_symmetric(
        41, n=700, ngroups=9, noffdiag=18, dtype=np.float32,
        contiguous=True)
    S_op = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape)
    plan = panel2_plan_symmetric(S_op._dlayout, S_op._olayout)
    assert plan is not None
    _oracle(plan, bst.to_scipy(S_op), shape[0])
    # transposed-diagonal variant (S^T): diagonal transposes, pair invariant
    planT = panel2_plan_symmetric(S_op._dlayout, S_op._olayout,
                                  transpose_diag=True)
    _oracle(planT, bst.to_scipy(S_op).T, shape[0])


def test_uniform_aligned_oracle():
    """Uniform aligned population (the config-1 shape)."""
    n, bs, nb = 1024, 64, 20
    rng = np.random.default_rng(9)
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, nb, replace=False)
    blocks = [rng.standard_normal((bs, bs)).astype(np.float32)
              for _ in range(nb)]
    rows = [np.arange((p // ntiles) * bs, (p // ntiles) * bs + bs)
            for p in pos]
    cols = [np.arange((p % ntiles) * bs, (p % ntiles) * bs + bs)
            for p in pos]
    A = bst.BlockSparseMatrix(blocks, rows, cols, (n, n))
    plan = panel2_plan_from_layout(A._layout)
    assert plan is not None
    _oracle(plan, bst.to_scipy(A), n)


def test_vjp_exact():
    blocks, rows, cols, shape = random_block_sparse(
        seed=55, shape=(400, 400), nblocks=12, max_block=40,
        dtype=np.float32, contiguous=True)
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    plan = panel2_plan_from_layout(A._layout)
    dev = panel2_device_arrays(plan)
    D = np.asarray(bst.to_scipy(A).todense())
    x = RNG.standard_normal(shape[1]).astype(np.float32)

    f = lambda v: jnp.sum(panel2_apply(plan, dev, v, interpret=True) ** 2)
    gx = np.asarray(jax.grad(f)(jnp.asarray(x)))
    gref = 2 * D.T @ (D @ x)
    np.testing.assert_allclose(gx, gref, rtol=2e-4,
                               atol=2e-4 * max(1.0, np.abs(gref).max()))


def test_chooser_prefers_larger_seg_on_ties():
    """Aligned uniform blocks cover identically at every SEG; the chooser
    must pick the largest (fewest gather rows, cheapest map-back)."""
    n, bs = 512, 64
    rng = np.random.default_rng(2)
    blocks = [rng.standard_normal((bs, bs)).astype(np.float32)
              for _ in range(6)]
    rows = [np.arange(i * bs, (i + 1) * bs) for i in range(6)]
    cols = [np.arange(((i * 3) % 8) * bs, ((i * 3) % 8 + 1) * bs)
            for i in range(6)]
    lay = build_layout(blocks, rows, cols, (n, n), dtype=np.float32)
    plan = choose_seg(_layout_entries(lay, transpose=False), (n, n))
    assert plan is not None and plan.seg == 32
