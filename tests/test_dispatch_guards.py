"""Routing guards: populations that must NOT take a kernel path."""

import numpy as np
import pytest

import blocksparse_tpu as bst
from blocksparse_tpu.ops.dispatch import _bucket_eligible


def test_smem_table_guard():
    """Large fine-chunk populations overflow the kernel's SMEM scalar
    prefetch (observed on-chip: 2000 blocks at chunk=8 -> 3.2 MB table ->
    Mosaic compile error).  _bucket_eligible must reject them so the XLA
    engine serves the product instead of crashing the compile."""
    rng = np.random.default_rng(0)
    n, nb, bs = 8192, 600, 128
    # UNALIGNED contiguous starts -> fine chunk granularity
    blocks = [rng.standard_normal((bs, bs)).astype(np.float32)
              for _ in range(nb)]
    rows = [np.arange(r, r + bs) for r in rng.integers(1, n - bs, size=nb)]
    cols = [np.arange(c, c + bs) for c in rng.integers(1, n - bs, size=nb)]
    A = bst.BlockSparseMatrix(blocks, rows, cols, (n, n))
    x = rng.standard_normal((n, 8)).astype(np.float32)
    big = [hb for hb in A._layout.buckets
           if hb.chunk > 1 and hb.nblocks * 4 * (
               hb.mp // hb.chunk + hb.kp // hb.chunk) > 400_000]
    for hb in big:
        assert not _bucket_eligible(hb, n, n, 8, False, np.float32)
    # the product itself must still be correct through whatever engine
    S = bst.to_scipy(A)
    y = np.asarray(A @ x)
    ref = S @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_smem_guard_accepts_small():
    rng = np.random.default_rng(1)
    n, nb, bs = 1024, 20, 64
    blocks = [rng.standard_normal((bs, bs)).astype(np.float32)
              for _ in range(nb)]
    pos = rng.choice((n // bs) ** 2, size=nb, replace=False)
    rows = [np.arange(r, r + bs) for r in (pos // (n // bs)) * bs]
    cols = [np.arange(c, c + bs) for c in (pos % (n // bs)) * bs]
    A = bst.BlockSparseMatrix(blocks, rows, cols, (n, n))
    for hb in A._layout.buckets:
        tb = hb.nblocks * 4 * (hb.mp // hb.chunk + hb.kp // hb.chunk)
        assert tb <= 400_000
