"""On-chip test tier (VERDICT #9): Pallas == XLA on the real TPU.

The CPU suite validates kernel LOGIC (pallas-interpret); this tier asserts
the COMPILED kernels agree with the XLA engine and the scipy oracle on the
actual device, for all three formats and bf16.

Run:  BST_TPU_TESTS=1 python -m pytest tests/test_tpu.py -v
(the default axon platform is kept; everything else in tests/ is skipped).
The committed run log lives at tests/tpu_tier.log (referenced from
COVERAGE.md).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

jnp = pytest.importorskip("jax.numpy")

# f32 on-chip tolerance: products are exact-f32 (precision=highest); the
# oracle accumulates differently, so allow a few ulp * problem scale.
TOL = 5e-4


def relerr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(1.0, float(np.max(np.abs(b))))
    return float(np.max(np.abs(a - b))) / scale


@pytest.fixture(scope="module")
def contiguous_bsm():
    import blocksparse_tpu as bst

    rng = np.random.default_rng(5)
    n, nb, bs = 1024, 24, 64
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nb, replace=False)
    rows = (pos // ntiles) * bs
    cols = (pos % ntiles) * bs
    blocks = [rng.standard_normal((bs, bs)).astype(np.float32)
              for _ in range(nb)]
    rowlists = [np.arange(r, r + bs) for r in rows]
    collists = [np.arange(c, c + bs) for c in cols]

    def build(**kw):
        return bst.BlockSparseMatrix(blocks, rowlists, collists, (n, n), **kw)

    return build


def test_bsm_pallas_vs_xla_spmm(contiguous_bsm):
    import blocksparse_tpu as bst

    A_x = contiguous_bsm(backend="xla")
    A_p = contiguous_bsm(backend="pallas")
    rng = np.random.default_rng(1)
    X = rng.standard_normal((A_x.shape[1], 128)).astype(np.float32)
    y_x = np.asarray(A_x @ X)
    y_p = np.asarray(A_p @ X)
    oracle = bst.to_scipy(A_x) @ X
    assert relerr(y_p, y_x) < TOL
    assert relerr(y_x, oracle) < TOL
    assert relerr(y_p, oracle) < TOL


def test_bsm_spmv_engines_agree(contiguous_bsm):
    import blocksparse_tpu as bst

    A_x = contiguous_bsm(backend="xla")
    A_p = contiguous_bsm(backend="pallas")
    rng = np.random.default_rng(2)
    x = rng.standard_normal(A_x.shape[1]).astype(np.float32)
    oracle = bst.to_scipy(A_x) @ x
    assert relerr(A_x @ x, oracle) < TOL
    assert relerr(A_p @ x, oracle) < TOL
    assert relerr(A_x.T @ x, bst.to_scipy(A_x).T @ x) < TOL


def test_symmetric_slab_on_chip(monkeypatch):
    """The one-read fused slab kernel vs the XLA engine on device."""
    import blocksparse_tpu as bst
    from blocksparse_tpu.utils.testmatrices import random_symmetric

    d, di, o, ri, ci, shape = random_symmetric(
        3, n=2048, ngroups=24, noffdiag=40, dtype=np.float32, contiguous=True
    )
    S_x = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape, backend="xla")
    monkeypatch.setenv("BST_STRIP", "always")
    S_s = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(shape[1]).astype(np.float32)
    oracle = bst.to_scipy(S_x) @ x
    assert relerr(S_x @ x, oracle) < TOL
    assert relerr(S_s @ x, oracle) < TOL


def test_vbcrs_on_chip():
    import blocksparse_tpu as bst
    from blocksparse_tpu.utils.testmatrices import random_vbcrs

    blocks, rstarts, cstarts, shape = random_vbcrs(
        6, shape=(1024, 1024), nrowgroups=12, ncolgroups=12, dtype=np.float32
    )
    V = bst.VariableBlockCompressedRowStorage(blocks, rstarts, cstarts, shape)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(shape[1]).astype(np.float32)
    assert relerr(V @ x, bst.to_scipy(V) @ x) < TOL


def test_complex_on_chip():
    """ComplexF64-use-case parity on the real device (VERDICT r2 weak #5).

    The reference's primary workload is complex BEM matrices
    (test_symmetricblockmatrix.jl:68-98).  The tunneled TPU cannot transfer
    complex arrays, so the on-chip path is the split-real engine
    (complexops.py): four real fast-engine products per complex product via
    ``mv_split``/``mm_split``; complex64 so the children are f32.
    """
    import blocksparse_tpu as bst
    from blocksparse_tpu.utils.testmatrices import random_symmetric

    d, di, o, ri, ci, shape = random_symmetric(
        9, n=1024, ngroups=16, noffdiag=24, dtype=np.complex64,
        contiguous=True,
    )
    S = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape)
    sp = S.split()
    oracle = bst.to_scipy(S)
    rng = np.random.default_rng(10)
    x = (rng.standard_normal(shape[1])
         + 1j * rng.standard_normal(shape[1])).astype(np.complex64)
    yr, yi = sp.mv_split(np.real(x).astype(np.float32),
                         np.imag(x).astype(np.float32))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = oracle @ x
    assert relerr(y.real, ref.real) < TOL
    assert relerr(y.imag, ref.imag) < TOL
    # adjoint distinguishes from transpose in complex (alpha=i oracle tests)
    yr2, yi2 = sp.apply_split(
        jnp.asarray(np.real(x).astype(np.float32)),
        jnp.asarray(np.imag(x).astype(np.float32)),
        transpose=True, conj=True)
    yH = np.asarray(yr2) + 1j * np.asarray(yi2)
    refH = oracle.conj().T @ x
    assert relerr(yH.real, refH.real) < TOL
    assert relerr(yH.imag, refH.imag) < TOL
    # multi-RHS split
    Xr = rng.standard_normal((shape[1], 16)).astype(np.float32)
    Xi = rng.standard_normal((shape[1], 16)).astype(np.float32)
    Yr, Yi = sp.mm_split(Xr, Xi)
    refM = oracle @ (Xr + 1j * Xi)
    assert relerr(np.asarray(Yr), refM.real) < TOL
    assert relerr(np.asarray(Yi), refM.imag) < TOL


def test_bf16_on_chip(contiguous_bsm):
    """bf16 storage path on the MXU; loose tolerance (bf16 mantissa)."""
    import blocksparse_tpu as bst

    A = contiguous_bsm(dtype=np.dtype("bfloat16") if hasattr(np, "bfloat16")
                       else "bfloat16")
    rng = np.random.default_rng(8)
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    oracle = bst.to_scipy(
        contiguous_bsm(backend="xla")) @ x
    assert relerr(np.asarray(A @ x, np.float32), oracle) < 0.05


def test_batched_products_on_chip(contiguous_bsm):
    """Round-5 batched multi-operand APIs on the real chip: one launch for
    P same-structure products (batched_mm via the patch mono-kernel,
    batched_mv via the panel kernel) vs per-operator products."""
    import blocksparse_tpu as bst

    rng = np.random.default_rng(17)
    ops = [contiguous_bsm()]
    # distinct-value same-structure copies
    base = ops[0]
    for seed in (1, 2):
        vr = np.random.default_rng(seed)
        blocks = [vr.standard_normal(base.block(i).shape).astype(np.float32)
                  for i in range(base.nblocks)]
        ops.append(bst.BlockSparseMatrix(
            blocks,
            [base.blockrowindices(i) for i in range(base.nblocks)],
            [base.blockcolindices(i) for i in range(base.nblocks)],
            base.shape,
        ))
    n = base.shape[1]
    Xs = rng.standard_normal((3, n, 32)).astype(np.float32)
    out = np.asarray(bst.batched_mm(ops, Xs))
    for p, op in enumerate(ops):
        assert relerr(out[p], np.asarray(op @ Xs[p])) < TOL
    xs = rng.standard_normal((3, n)).astype(np.float32)
    outv = np.asarray(bst.batched_mv(ops, xs))
    for p, op in enumerate(ops):
        assert relerr(outv[p], np.asarray(op @ xs[p])) < TOL
