"""Pallas kernel tests (interpreter mode on CPU).

The parallel-vs-serial duality of the reference (SURVEY.md §4) becomes
interpret-mode Pallas vs the XLA engine here: both paths must agree with the
scipy oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import blocksparse_tpu as bst
from blocksparse_tpu.ops.pallas.fused_spmm import chunked_block_apply
from blocksparse_tpu.utils.testmatrices import random_vbcrs

TOL32 = 1e-4


def relerr(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    scale = max(1.0, float(np.max(np.abs(b))) if b.size else 1.0)
    return float(np.max(np.abs(a - b))) / scale


def _tables(starts, extent, C):
    """Chunk tables for contiguous C-aligned windows."""
    return np.stack([s // C + np.arange(extent // C) for s in starts]).astype(
        np.int32
    )


def test_kernel_uniform_blocks(rng):
    nb, mp, kp, N, C = 20, 16, 32, 304, 8
    vals = rng.standard_normal((nb, mp, kp)).astype(np.float32)
    rs = (rng.integers(0, (N - mp) // C, nb) * C).astype(np.int32)
    cs = (rng.integers(0, (N - kp) // C, nb) * C).astype(np.int32)
    rc, cc = _tables(rs, mp, C), _tables(cs, kp, C)
    x = rng.standard_normal(N).astype(np.float32)

    ref = np.zeros(N, np.float64)
    for b in range(nb):
        ref[rs[b] : rs[b] + mp] += vals[b].astype(np.float64) @ x[cs[b] : cs[b] + kp]
    y = chunked_block_apply(
        jnp.asarray(vals), jnp.asarray(rc), jnp.asarray(cc), C,
        jnp.asarray(x), N, interpret=True,
    )
    assert relerr(y, ref) < TOL32

    reft = np.zeros(N, np.float64)
    for b in range(nb):
        reft[cs[b] : cs[b] + kp] += vals[b].T.astype(np.float64) @ x[rs[b] : rs[b] + mp]
    yt = chunked_block_apply(
        jnp.asarray(vals), jnp.asarray(rc), jnp.asarray(cc), C,
        jnp.asarray(x), N, transpose=True, interpret=True,
    )
    assert relerr(yt, reft) < TOL32


def test_kernel_scattered_chunks(rng):
    """Chunk tables need not describe contiguous ranges: k-merged slots
    concatenate several column windows (core/layout.py _kmerge)."""
    nb, mp, kp, N, C = 8, 16, 32, 256, 8
    vals = rng.standard_normal((nb, mp, kp)).astype(np.float32)
    rc = _tables((rng.integers(0, (N - mp) // C, nb) * C), mp, C)
    cc = rng.integers(0, N // C, (nb, kp // C)).astype(np.int32)  # arbitrary
    x = rng.standard_normal(N).astype(np.float32)
    ref = np.zeros(N, np.float64)
    for b in range(nb):
        xg = np.concatenate([x[c * C : (c + 1) * C] for c in cc[b]])
        lo = rc[b, 0] * C
        ref[lo : lo + mp] += vals[b].astype(np.float64) @ xg
    y = chunked_block_apply(
        jnp.asarray(vals), jnp.asarray(rc), jnp.asarray(cc), C,
        jnp.asarray(x), N, interpret=True,
    )
    assert relerr(y, ref) < TOL32


def test_kernel_multi_rhs(rng):
    nb, mp, kp, N, r, C = 10, 8, 8, 120, 9, 8
    vals = rng.standard_normal((nb, mp, kp)).astype(np.float32)
    rs = (rng.integers(0, (N - mp) // C, nb) * C).astype(np.int32)
    cs = (rng.integers(0, (N - kp) // C, nb) * C).astype(np.int32)
    rc, cc = _tables(rs, mp, C), _tables(cs, kp, C)
    X = rng.standard_normal((N, r)).astype(np.float32)
    ref = np.zeros((N, r), np.float64)
    for b in range(nb):
        ref[rs[b] : rs[b] + mp] += vals[b].astype(np.float64) @ X[cs[b] : cs[b] + kp]
    Y = chunked_block_apply(
        jnp.asarray(vals), jnp.asarray(rc), jnp.asarray(cc), C,
        jnp.asarray(X), N, interpret=True,
    )
    assert relerr(Y, ref) < TOL32


def test_vbcrs_pallas_backend_matches_xla(rng):
    """Interpret-mode Pallas backend vs XLA engine on the same VBCRS matrix."""
    blocks, rstarts, cstarts, shape = random_vbcrs(
        51, shape=(400, 400), nrowgroups=8, ncolgroups=8, dtype=np.float64
    )
    blocks32 = [b.astype(np.float32) for b in blocks]
    Vx = bst.VariableBlockCompressedRowStorage(
        blocks32, rstarts, cstarts, shape, backend="xla"
    )
    Vp = bst.VariableBlockCompressedRowStorage(
        blocks32, rstarts, cstarts, shape, backend="pallas-interpret"
    )
    x = rng.standard_normal(shape[1]).astype(np.float32)
    assert relerr(Vp @ x, Vx @ x) < TOL32
    assert relerr(Vp.T @ x, Vx.T @ x) < TOL32
    X = rng.standard_normal((shape[1], 4)).astype(np.float32)
    assert relerr(Vp @ X, Vx @ X) < TOL32


def test_symmetric_fused_kernel(rng):
    """Fused one-read symmetric pass vs the XLA 3-pass engine."""
    from blocksparse_tpu.utils.testmatrices import random_symmetric

    d, di, o, ri, ci, shape = random_symmetric(
        61, n=256, ngroups=8, noffdiag=12, dtype=np.float64, contiguous=True
    )
    d32 = [b.astype(np.float32) for b in d]
    o32 = [b.astype(np.float32) for b in o]
    Sx = bst.SymmetricBlockMatrix(d32, di, o32, ri, ci, shape, backend="xla")
    Sp = bst.SymmetricBlockMatrix(
        d32, di, o32, ri, ci, shape, backend="pallas-interpret"
    )
    x = rng.standard_normal(shape[0]).astype(np.float32)
    assert relerr(Sp @ x, Sx @ x) < TOL32
    assert relerr(Sp.T @ x, Sx.T @ x) < TOL32
    X = rng.standard_normal((shape[0], 3)).astype(np.float32)
    assert relerr(Sp @ X, Sx @ X) < TOL32


def test_wide_rhs_split(rng):
    """r > R_SLICE runs as multiple kernel launches + concat."""
    blocks, rstarts, cstarts, shape = random_vbcrs(
        53, shape=(256, 256), nrowgroups=4, ncolgroups=4, dtype=np.float64
    )
    blocks32 = [b.astype(np.float32) for b in blocks]
    Vx = bst.VariableBlockCompressedRowStorage(
        blocks32, rstarts, cstarts, shape, backend="xla"
    )
    Vp = bst.VariableBlockCompressedRowStorage(
        blocks32, rstarts, cstarts, shape, backend="pallas-interpret"
    )
    X = rng.standard_normal((shape[1], 130)).astype(np.float32)  # > R_SLICE
    assert relerr(Vp @ X, Vx @ X) < TOL32


def test_scattered_bucket_falls_back(rng):
    """Non-contiguous index lists must route to the XLA engine even when the
    pallas backend is requested."""
    blocks = [rng.standard_normal((3, 3)).astype(np.float32)]
    rows = [np.array([0, 2, 4])]
    cols = [np.array([1, 3, 5])]
    A = bst.BlockSparseMatrix(blocks, rows, cols, (8, 8), backend="pallas-interpret")
    S = bst.to_scipy(A)
    x = rng.standard_normal(8).astype(np.float32)
    assert relerr(A @ x, S @ x) < TOL32


def test_precision_high_split3(rng):
    """precision="high" runs the in-kernel split-bf16 3-pass emulation
    (_dot3; Mosaic cannot lower Precision.HIGH) -- must stay in the ~1e-6
    relative-accuracy class of XLA's HIGH, far better than DEFAULT's
    single bf16 pass (measured on-chip: 23.9 us vs highest's 31.2 us at
    4.6e-6 rel err on the config-4 population)."""
    nb, mp, kp, N, C, r = 12, 16, 32, 304, 8, 8
    vals = rng.standard_normal((nb, mp, kp)).astype(np.float32)
    rs = (rng.integers(0, (N - mp) // C, nb) * C).astype(np.int32)
    cs = (rng.integers(0, (N - kp) // C, nb) * C).astype(np.int32)
    rc, cc = _tables(rs, mp, C), _tables(cs, kp, C)
    X = rng.standard_normal((N, r)).astype(np.float32)

    ref = np.zeros((N, r), np.float64)
    for b in range(nb):
        ref[rs[b]: rs[b] + mp] += (
            vals[b].astype(np.float64) @ X[cs[b]: cs[b] + kp]
        )
    y = chunked_block_apply(
        jnp.asarray(vals), jnp.asarray(rc), jnp.asarray(cc), C,
        jnp.asarray(X), N, interpret=True, precision="high",
    )
    assert relerr(y, ref) < 1e-4
    # and through the operator API end to end
    A = bst.BlockSparseMatrix(
        [vals[b] for b in range(nb)],
        [np.arange(rs[b], rs[b] + mp) for b in range(nb)],
        [np.arange(cs[b], cs[b] + kp) for b in range(nb)],
        (N, N), backend="pallas-interpret", precision="high",
    )
    S = bst.to_scipy(A)
    assert relerr(np.asarray(A @ jnp.asarray(X)), S @ X) < 1e-4
