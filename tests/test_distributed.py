"""Distributed-layer tests on a virtual 8-device CPU mesh.

The JAX analog of testing multi-node without a cluster (SURVEY.md §4):
``--xla_force_host_platform_device_count=8`` is set in conftest.py.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import blocksparse_tpu as bst
from blocksparse_tpu.parallel.distributed import distribute
from blocksparse_tpu.utils.testmatrices import (
    random_block_sparse,
    random_symmetric,
    random_vbcrs,
)

TOL = 1e-12


def relerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1.0, float(np.max(np.abs(b))) if b.size else 1.0)
    return float(np.max(np.abs(a - b))) / scale


def mesh_of(n):
    devs = jax.devices()
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), ("rows",))


@pytest.mark.parametrize("nshards", [2, 8])
def test_block_sparse_spmv(nshards, rng):
    blocks, rows, cols, shape = random_block_sparse(
        41, shape=(519, 519), nblocks=40, max_block=50, dtype=np.float64
    )
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    D = distribute(A, mesh_of(nshards))
    x = rng.standard_normal(shape[1])
    assert relerr(D.mv(x), A @ x) < TOL


def test_symmetric_spmv_reduce_scatter(rng):
    """Symmetric transposed contributions land on remote rows -> exercises
    the psum_scatter path."""
    d, di, o, ri, ci, shape = random_symmetric(
        42, n=640, ngroups=16, noffdiag=40, dtype=np.float64
    )
    S_op = bst.SymmetricBlockMatrix(d, di, o, ri, ci, shape)
    D = distribute(S_op, mesh_of(8))
    assert D.has_remote  # scattered symmetric structure must cross shards
    x = rng.standard_normal(shape[1])
    assert relerr(D.mv(x), S_op @ x) < TOL


def test_vbcrs_spmm(rng):
    blocks, rstarts, cstarts, shape = random_vbcrs(
        43, shape=(800, 800), nrowgroups=16, ncolgroups=16, dtype=np.float64
    )
    V = bst.VariableBlockCompressedRowStorage(blocks, rstarts, cstarts, shape)
    D = distribute(V, mesh_of(4))
    X = rng.standard_normal((shape[1], 6))
    assert relerr(D.mm(X), V @ X) < TOL


def test_transpose_and_adjoint_distribution(rng):
    blocks, rows, cols, shape = random_block_sparse(
        44, shape=(512, 512), nblocks=30, max_block=40, dtype=np.complex128
    )
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    x = rng.standard_normal(shape[0]) + 1j * rng.standard_normal(shape[0])
    Dt = distribute(A.T, mesh_of(4))
    Dh = distribute(A.H, mesh_of(4))
    assert relerr(Dt.mv(x), A.T @ x) < TOL
    assert relerr(Dh.mv(x), A.H @ x) < TOL


def test_uneven_rows(rng):
    """nrows not divisible by nshards -> padded partition."""
    blocks, rows, cols, shape = random_block_sparse(
        45, shape=(501, 503), nblocks=25, max_block=30, dtype=np.float64
    )
    A = bst.BlockSparseMatrix(blocks, rows, cols, shape)
    D = distribute(A, mesh_of(8))
    x = rng.standard_normal(shape[1])
    assert relerr(D.mv(x), A @ x) < TOL
