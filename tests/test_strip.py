"""Slab/strip kernel tests (interpreter mode on CPU).

Oracle pattern per SURVEY.md §4: build the operator, compare products
against a scipy/dense ground truth.  The slab kernel is f32, so tolerances
are f32-scale (the 1e-13 f64 oracle tier runs on the XLA engine paths).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import blocksparse_tpu as bst
from blocksparse_tpu.core.strip import (
    build_strip_plan, plan_from_layout, plan_symmetric,
)
from blocksparse_tpu.ops.pallas.slab_spmv import (
    plan_device_arrays, slab_apply,
)
from blocksparse_tpu.utils.testmatrices import random_symmetric

TOL = 2e-5


def _dense_from(blocks, rows, cols, shape):
    A = np.zeros(shape, np.float32)
    for b, r, c in zip(blocks, rows, cols):
        A[np.ix_(np.asarray(r), np.asarray(c))] += np.asarray(b, np.float32)
    return A


def _random_contig(seed, n=640, m=640, nblocks=25):
    rng = np.random.default_rng(seed)
    blocks, rows, cols = [], [], []
    for _ in range(nblocks):
        h = int(rng.integers(1, 150))
        w = int(rng.integers(1, 150))
        r0 = int(rng.integers(0, m - h))
        c0 = int(rng.integers(0, n - w))
        blocks.append(rng.standard_normal((h, w)).astype(np.float32))
        rows.append(np.arange(r0, r0 + h))
        cols.append(np.arange(c0, c0 + w))
    return blocks, rows, cols, (m, n)


def test_plan_roundtrip_forward():
    blocks, rows, cols, shape = _random_contig(0)
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    plan = plan_from_layout(A.layout)
    assert plan is not None
    dev = plan_device_arrays(plan)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape[1]).astype(np.float32))
    y = np.asarray(slab_apply(plan, dev, x, interpret=True))
    ref = _dense_from(blocks, rows, cols, shape) @ np.asarray(x)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < TOL


def test_plan_transpose():
    blocks, rows, cols, shape = _random_contig(2, m=512, n=768)
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    plan = plan_from_layout(A.layout, transpose=True)
    dev = plan_device_arrays(plan)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape[0]).astype(np.float32))
    y = np.asarray(slab_apply(plan, dev, x, interpret=True))
    ref = _dense_from(blocks, rows, cols, shape).T @ np.asarray(x)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < TOL


def test_symmetric_unified_plan():
    d, di, o, ri, ci, shape = random_symmetric(
        5, n=900, ngroups=14, noffdiag=30, dtype=np.float32, contiguous=True)
    S = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape)
    plan = plan_symmetric(S._dlayout, S._olayout)
    assert plan is not None and plan.mirror
    dev = plan_device_arrays(plan)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal(shape[0]).astype(np.float32))
    y = np.asarray(slab_apply(plan, dev, x, interpret=True))
    A = _dense_from(o, ri, ci, shape)
    A = A + A.T + _dense_from(d, di, di, shape)
    ref = A @ np.asarray(x)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < TOL


def test_dispatch_engages_strip():
    """backend='pallas-interpret' at r=1/f32 routes through the slab kernel
    and matches the XLA engine."""
    blocks, rows, cols, shape = _random_contig(7)
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape,
                              backend="pallas-interpret", dtype=np.float32)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal(shape[1]).astype(np.float32))
    y = np.asarray(A @ x)
    assert A._strip_for(False) is not None  # plan was built and cached
    ref = _dense_from(blocks, rows, cols, shape) @ np.asarray(x)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < TOL
    # transpose route
    yt = np.asarray(A.T @ jnp.asarray(
        rng.standard_normal(shape[0]).astype(np.float32)))
    assert yt.shape == (shape[1],)


def test_symmetric_dispatch_and_transpose():
    d, di, o, ri, ci, shape = random_symmetric(
        9, n=700, ngroups=10, noffdiag=20, dtype=np.float32, contiguous=True)
    # make diagonal blocks asymmetric so S^T != S exercises the diag-T plan
    S = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape,
                                 backend="pallas-interpret", dtype=np.float32)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal(shape[0]).astype(np.float32))
    A = _dense_from(o, ri, ci, shape)
    A = A + A.T + _dense_from(d, di, di, shape)
    y = np.asarray(S @ x)
    assert np.max(np.abs(y - A @ np.asarray(x))) / np.max(np.abs(A @ np.asarray(x))) < TOL
    yt = np.asarray(S.T @ x)
    reft = A.T @ np.asarray(x)
    assert np.max(np.abs(yt - reft)) / np.max(np.abs(reft)) < TOL


def test_scattered_blocks_fall_back():
    """Non-contiguous index lists are ineligible for strips; dispatch must
    fall back to the element engine and stay correct."""
    rng = np.random.default_rng(11)
    n = 300
    rows = [np.sort(rng.choice(n, size=40, replace=False)) for _ in range(3)]
    cols = [np.sort(rng.choice(n, size=30, replace=False)) for _ in range(3)]
    blocks = [rng.standard_normal((40, 30)).astype(np.float32) for _ in range(3)]
    A = bst.BlockSparseMatrix(blocks, rows, cols, (n, n),
                              backend="pallas-interpret", dtype=np.float32)
    assert A._strip_for(False) is None
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y = np.asarray(A @ x)
    ref = _dense_from(blocks, rows, cols, (n, n)) @ np.asarray(x)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < TOL


def test_vjp_matches_xla():
    """grad through the slab kernel: compare against the XLA-backend grad."""
    blocks, rows, cols, shape = _random_contig(12, m=384, n=384, nblocks=8)
    A_strip = bst.BlockSparseMatrix(blocks, rows, cols, shape,
                                    backend="pallas-interpret",
                                    dtype=np.float32)
    A_xla = bst.BlockSparseMatrix(blocks, rows, cols, shape, backend="xla",
                                  dtype=np.float32)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal(shape[1]).astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum(A_strip @ v) ** 2)(x)
    g2 = jax.grad(lambda v: jnp.sum(A_xla @ v) ** 2)(x)
    assert np.max(np.abs(np.asarray(g1) - np.asarray(g2))) / max(
        float(jnp.max(jnp.abs(g2))), 1e-9) < TOL


def test_vjp_symmetric():
    d, di, o, ri, ci, shape = random_symmetric(
        14, n=500, ngroups=8, noffdiag=12, dtype=np.float32, contiguous=True)
    S_strip = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape,
                                       backend="pallas-interpret",
                                       dtype=np.float32)
    S_xla = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape, backend="xla",
                                     dtype=np.float32)
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal(shape[0]).astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum((S_strip @ v) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum((S_xla @ v) ** 2))(x)
    assert np.max(np.abs(np.asarray(g1) - np.asarray(g2))) / max(
        float(jnp.max(jnp.abs(g2))), 1e-9) < 1e-4


def test_small_matrix_window_padding():
    """nrows < RW*RC exercises the n8p >= RW padding path."""
    blocks, rows, cols, shape = _random_contig(16, m=200, n=200, nblocks=5)
    plan = build_strip_plan(
        [(b, int(r[0]), int(c[0]), 0.0)
         for b, r, c in zip(blocks, rows, cols)], shape, mirror=False)
    dev = plan_device_arrays(plan)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal(shape[1]).astype(np.float32))
    y = np.asarray(slab_apply(plan, dev, x, interpret=True))
    ref = _dense_from(blocks, rows, cols, shape) @ np.asarray(x)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < TOL
