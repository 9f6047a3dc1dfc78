"""Symmetric block-sparse format: off-diagonal blocks stored once.

Parity target: ``SymmetricBlockMatrix`` (src/symmetricblockmatrix.jl:33-44,
94-126): diagonal blocks at ``diagonalindices`` stored once, off-diagonal
blocks stored once but applied *twice* -- as-is to ``y[rowindices]`` and
transposed to ``y[colindices]`` -- so the implied matrix is

    S = D + O + O^T        (O = off-diagonal blocks at (rows, cols))

The reference's 3-pass kernel (symmetricblockmatrix.jl:386-435) reads each
off-diagonal block twice; the Pallas fused kernel (ops/pallas/) reads it once
and issues both MXU contractions.  This class always computes all three color
sets at construction regardless of the schedule -- deliberate parity with the
reference's asymmetry vs BlockSparseMatrix (symmetricblockmatrix.jl:104-110).

Transpose/adjoint semantics (derived, matching the reference's wrapper
machinery symmetricblockmatrix.jl:219-237, 307-325, 341-365):
    S^T      = D^T + O + O^T            (only the diagonal pass transposes)
    S^H      = D^H + conj(O) + O^H      (= conj-mode of the off-diag pair)
    conj(S)  = conj(D) + conj(O) + conj(O)^T
so the off-diagonal pair honors only the conj flag, while the diagonal pass
honors both flags.  Complex-symmetric (BEM/EFIE) matrices therefore get
``S' != S`` correct, which the reference tests exercise with ComplexF64
(test_symmetricblockmatrix.jl:68-98).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import schedule as sched
from ..core.device import stage_buckets
from ..core.layout import BlockLayout, build_layout
from ..core.operator import LinearOperator
from ..ops.dispatch import apply_symmetric

__all__ = ["SymmetricBlockMatrix"]


def _colors_tuple(colors) -> tuple[tuple[int, ...], ...]:
    return tuple(tuple(int(b) for b in group) for group in colors)


@jax.tree_util.register_pytree_node_class
class SymmetricBlockMatrix(LinearOperator):
    """Symmetric block-sparse matrix (format 2)."""

    def __init__(
        self,
        diagonals: Sequence[np.ndarray] | None = None,
        diagonalindices: Sequence[np.ndarray] | None = None,
        offdiagonals: Sequence[np.ndarray] | None = None,
        rowindices: Sequence[np.ndarray] | None = None,
        colindices: Sequence[np.ndarray] | None = None,
        shape: tuple[int, int] | None = None,
        *,
        schedule: str = sched.COLORED,
        granularity="pow2",
        backend: str = "auto",
        precision: str | None = "highest",
        optimize: str | None = None,
        dtype=None,
        _internal=None,
    ):
        if _internal is not None:
            (self._dlayout, self._olayout, self._schedule, self._backend,
             self._precision, self._granularity, self._dcolors, self._ocolors,
             self._tocolors, self._fused_colors, self._optimize,
             self._dbuckets, self._obuckets) = _internal
            return
        if shape is None:
            raise ValueError("shape=(nrows, ncols) is required")
        if shape[0] != shape[1]:
            raise ValueError(f"symmetric matrix must be square, got {shape}")
        self._schedule = sched.normalize_schedule(schedule)
        self._backend = backend
        self._precision = precision
        self._optimize = optimize
        self._granularity = granularity
        self._dlayout = build_layout(
            diagonals, diagonalindices, diagonalindices, shape,
            granularity=granularity, dtype=dtype,
        )
        self._olayout = build_layout(
            offdiagonals, rowindices, colindices, shape,
            granularity=granularity, dtype=dtype,
        )
        self._dbuckets = stage_buckets(self._dlayout.buckets)
        self._obuckets = stage_buckets(self._olayout.buckets)

        # Always color (parity: symmetricblockmatrix.jl:104-110).
        from .. import coloring

        self._dcolors = _colors_tuple(
            coloring.color_blocks(self._dlayout.rowindices)
        )
        self._ocolors = _colors_tuple(
            coloring.color_blocks(self._olayout.rowindices)
        )
        self._tocolors = _colors_tuple(
            coloring.color_blocks(self._olayout.colindices)
        )
        # Colors on the UNION of row+col index sets: make the fused
        # one-read/two-scatter kernel conflict-free (SURVEY.md §7 stance 4).
        union_lists = [
            np.concatenate([r, c])
            for r, c in zip(self._olayout.rowindices, self._olayout.colindices)
        ]
        self._fused_colors = _colors_tuple(coloring.color_blocks(union_lists))

    # -- pytree -------------------------------------------------------------
    def tree_flatten(self):
        leaves = (self._dbuckets, self._obuckets)
        aux = (
            self._dlayout, self._olayout, self._schedule, self._backend,
            self._precision, self._granularity, self._dcolors, self._ocolors,
            self._tocolors, self._fused_colors, self._optimize,
        )
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        dbuckets, obuckets = leaves
        return cls(_internal=aux + (tuple(dbuckets), tuple(obuckets)))

    # -- properties ---------------------------------------------------------
    @property
    def shape(self) -> tuple[int, int]:
        return (self._dlayout.nrows, self._dlayout.ncols)

    @property
    def dtype(self):
        for bs in (self._dbuckets, self._obuckets):
            if bs:
                return bs[0][0].dtype
        return jnp.float32

    @property
    def schedule(self) -> str:
        return self._schedule

    @property
    def ndiagonals(self) -> int:
        return self._dlayout.nblocks

    @property
    def noffdiagonals(self) -> int:
        return self._olayout.nblocks

    @property
    def nnz(self) -> int:
        """Off-diagonals count twice (parity: symmetricblockmatrix.jl:367-384)."""
        return self._dlayout.nnz + 2 * self._olayout.nnz

    # -- reference API parity ----------------------------------------------
    def diagonal(self, i: int) -> np.ndarray:
        # host-side copy: no device fetch (see BlockSparseMatrix.block)
        return self._dlayout.extract_block(i)

    def offdiagonal(self, i: int) -> np.ndarray:
        # host-side copy: no device fetch (see BlockSparseMatrix.block)
        return self._olayout.extract_block(i)

    def diagonalindices(self, i: int) -> np.ndarray:
        """Parity: ``diagonalindices`` (symmetricblockmatrix.jl:327-339)."""
        return self._dlayout.rowindices[i]

    def blockrowindices(self, i: int) -> np.ndarray:
        return self._olayout.rowindices[i]

    def blockcolindices(self, i: int) -> np.ndarray:
        return self._olayout.colindices[i]

    def diagonalcolors(self):
        return self._dcolors

    def offdiagonalcolors(self):
        return self._ocolors

    def transposeoffdiagonalcolors(self):
        return self._tocolors

    def fusedcolors(self):
        """Colors on the union of row+col index sets (fused-kernel rounds)."""
        return self._fused_colors

    # -- compute ------------------------------------------------------------
    def _strip_for(self, transpose: bool):
        """Lazy unified slab plan: diag (mirror=0) + off-diag (mirror=1)
        tiles in ONE stream -> one kernel launch computes S = D + O + O^T
        with each stored off-diagonal read once (the fused pass the
        reference lacks, symmetricblockmatrix.jl:394-418)."""
        from ..core.device import plan_cache_entry
        from ..core.strip import plan_symmetric
        from ..ops.pallas.slab_spmv import plan_device_arrays

        cache = getattr(self, "_strip_cache", None)
        if cache is None:
            cache = {}
            self._strip_cache = cache
        return plan_cache_entry(
            cache, "T" if transpose else "N",
            lambda: plan_symmetric(self._dlayout, self._olayout,
                                   transpose_diag=transpose),
            plan_device_arrays)

    def _panel_for(self, transpose: bool):
        """Lazy fused symmetric panel plan (core/panel.py): diag + off-diag
        K-merged per row group, one kernel launch for S = D + O + O^T with
        each stored off-diagonal read once and padded/logical ~1.3 (the
        slab plan dilutes ~2.4x on BEM-like group sizes)."""
        from ..core.device import plan_cache_entry
        from ..ops.panel_router import panel_arrays, panel_plan_sym

        cache = getattr(self, "_panel_cache", None)
        if cache is None:
            cache = {}
            self._panel_cache = cache
        return plan_cache_entry(
            cache, "T" if transpose else "N",
            lambda: panel_plan_sym(self._dlayout, self._olayout,
                                   transpose_diag=transpose),
            panel_arrays)

    def _patch_for(self, transpose: bool):
        """Lazy merged-patch plan: diag + off-diag in ONE plan whose
        off-diagonal chunks are mirror-counted (the fused one-read
        S = D + O + O^T pass).  S^T embeds D^T; the off-diagonal pair is
        transpose-invariant (symmetricblockmatrix.jl:341-365)."""
        from ..core.device import plan_cache_entry
        from ..core.patch import build_patch_plan
        from ..ops.patch_engine import patch_device_arrays

        cache = getattr(self, "_patch_cache", None)
        if cache is None:
            cache = {}
            self._patch_cache = cache
        return plan_cache_entry(
            cache, "T" if transpose else "N",
            lambda: build_patch_plan(
                self._dlayout, extra_layout=self._olayout,
                transpose_main=transpose, optimize=self._optimize),
            patch_device_arrays)

    def _apply(self, x, transpose: bool, conj: bool):
        split = self._complex_split_route()
        if split is not None:
            return split._apply(x, transpose, conj)
        # Off-diagonal pair honors only conj; diagonal honors both flags
        # (see module docstring).
        from ..ops.dispatch import (
            patch_eligible, patch_wins, strip_eligible)

        if patch_eligible(self._backend, x, self.dtype):
            entry = self._patch_for(transpose)
            r = 1 if x.ndim == 1 else x.shape[1]
            if entry is not None and patch_wins(
                    entry[0], [(self._dlayout, 1), (self._olayout, 2)], r):
                from ..ops.patch_engine import patch_apply

                # the plan embeds the transposed diagonal; the engine treats
                # symmetric plans as transpose-invariant
                return patch_apply(entry[0], entry[1], x, transpose=False,
                                   backend=self._backend,
                                   precision=self._precision)
        if strip_eligible(self._backend, x, self.dtype):
            from ..ops.dispatch import stream_plan_choice

            # XLA reads off-diagonal values twice (fwd + transposed
            # contribution are separate einsums); the fused streams read once.
            choice = stream_plan_choice(
                self._panel_for(transpose), self._strip_for(transpose),
                [(self._dlayout, 1), (self._olayout, 2)])
            interp = self._backend == "pallas-interpret"
            if choice == "panel":
                from ..ops.panel_router import panel_run

                entry = self._panel_for(transpose)
                return panel_run(entry[0], entry[1], x, interpret=interp)
            if choice == "strip":
                from ..ops.pallas.slab_spmv import slab_apply

                entry = self._strip_for(transpose)
                return slab_apply(entry[0], entry[1], x, interpret=interp)
        return apply_symmetric(
            self._dbuckets, self._dlayout, self._obuckets, self._olayout,
            self._backend, self.shape[0], x, transpose=transpose, conj=conj,
            precision=self._precision,
            # colored schedule -> scatter-free gather rounds: the diagonal
            # pass uses diagonalcolors, the fused one-read off-diagonal pass
            # uses fusedcolors (union row+col conflicts -- the invariant
            # both of its scatters need; SURVEY.md §7 stance 4)
            diag_colors=(
                None if sched.isserial(self._schedule) else self._dcolors
            ),
            fused_colors=(
                None if sched.isserial(self._schedule)
                else self._fused_colors
            ),
        )

    def __repr__(self):
        m, n = self.shape
        return (
            f"SymmetricBlockMatrix({m}x{n}, {self.ndiagonals} diagonal + "
            f"{self.noffdiagonals} off-diagonal blocks, nnz={self.nnz}, "
            f"dtype={self.dtype}, schedule={self._schedule!r})"
        )
