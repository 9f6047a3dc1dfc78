"""Distributed block-sparse products over a jax.sharding.Mesh.

The reference is single-process (SURVEY.md §2: no MPI/NCCL anywhere); this
module is the TPU-native scaling layer it lacks: 1-D **block-row
partitioning** over a device mesh with XLA/ICI collectives
(BASELINE.json north star).

Execution model per shard (inside ``shard_map``):

  1. ``all_gather`` the local x shard over the mesh axis (rides ICI; the
     overlapped-halo ``ppermute`` refinement is the planned optimization);
  2. local bucket GEMMs: gather x rows -> batched einsum -> scatter-add into
     the local accumulator for rows this shard OWNS;
  3. contributions to rows owned by OTHER shards (boundary-straddling blocks
     and symmetric transposed contributions) scatter into a global-length
     accumulator that is ``psum_scatter``-reduced onto the owning shards --
     the reduce-scatter the north star prescribes for symmetric matrices.

Symmetric operators are expanded into explicit contributions (diag once,
off-diag twice) for distribution; the on-chip fused kernel keeps single
storage on the single-chip path (ops/pallas).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import api
from ..core.layout import build_layout
from ..core.operator import (
    AdjointOperator,
    ConjOperator,
    LinearOperator,
    TransposeOperator,
)
from ..formats.symmetric import SymmetricBlockMatrix
from .partition import partition_rows, stack_buckets

__all__ = ["DistributedBlockOperator", "distribute"]


def _contributions(op):
    """Flatten any supported operator into host-side (blocks, rows, cols).

    Wrappers are resolved the same way the reference's lazy wrappers do
    (blockmatrix.jl:154-206); symmetric operators expand diag once +
    off-diag twice (as-is and transposed)."""
    base = op
    while isinstance(base, (TransposeOperator, AdjointOperator, ConjOperator)):
        base = base.op
    if isinstance(base, SymmetricBlockMatrix):
        blocks, rows, cols = [], [], []
        for i in range(base.ndiagonals):
            blocks.append(base.diagonal(i))
            rows.append(base.diagonalindices(i))
            cols.append(base.diagonalindices(i))
        for i in range(base.noffdiagonals):
            o = base.offdiagonal(i)
            blocks.append(o)
            rows.append(base.blockrowindices(i))
            cols.append(base.blockcolindices(i))
            blocks.append(o.T)
            rows.append(base.blockcolindices(i))
            cols.append(base.blockrowindices(i))
        # Resolve wrappers: the expansion above is of the *base* operator, so
        # apply the accumulated transpose/conj flags to the expanded blocks.
        tr = False
        cj = False
        w = op
        while isinstance(w, (TransposeOperator, AdjointOperator, ConjOperator)):
            if isinstance(w, TransposeOperator):
                tr = not tr
            elif isinstance(w, AdjointOperator):
                tr = not tr
                cj = not cj
            else:
                cj = not cj
            w = w.op
        out_blocks, out_rows, out_cols = [], [], []
        for b, r, c in zip(blocks, rows, cols):
            bb = np.conj(b) if cj else b
            if tr:
                out_blocks.append(np.asarray(bb).T)
                out_rows.append(c)
                out_cols.append(r)
            else:
                out_blocks.append(np.asarray(bb))
                out_rows.append(r)
                out_cols.append(c)
        return out_blocks, out_rows, out_cols, op.shape
    # generic path via the free-function API (resolves wrappers lazily)
    n = base.nblocks
    blocks = [api.block(op, i) for i in range(n)]
    rows = [api.rowindices(op, i) for i in range(n)]
    cols = [api.colindices(op, i) for i in range(n)]
    return blocks, rows, cols, op.shape


class DistributedBlockOperator:
    """Block-row-sharded operator bound to a 1-D mesh axis."""

    def __init__(self, op: LinearOperator, mesh: Mesh, axis: str = "rows",
                 *, granularity: tuple[int, int] = (1, 1)):
        self.mesh = mesh
        self.axis = axis
        nshards = mesh.shape[axis]
        blocks, rows, cols, shape = _contributions(op)
        # Honor the source operator's matmul precision (single-chip formats
        # default to "highest"; on TPU f32 the default einsum precision is
        # reduced, so dropping it would silently degrade distributed results).
        base = op
        while isinstance(base, (TransposeOperator, AdjointOperator, ConjOperator)):
            base = base.op
        self.precision = getattr(base, "_precision", "highest")
        self.shape = shape
        m, n = shape
        layout = build_layout(blocks, rows, cols, shape, granularity=granularity)
        self.dtype = np.result_type(*[b.dtype for b in blocks]) if blocks else np.float32

        self.part = partition_rows(m, nshards)
        self.rows_per = self.part.shard_rows
        self.cols_per = -(-n // nshards)
        self.padded_cols = self.cols_per * nshards
        stacked, self.padded_rows = stack_buckets(
            layout, self.part, cols_per=self.cols_per
        )
        # any remote contributions at all? (static: decides psum_scatter)
        def _group_has_remote(d):
            sent = self.padded_rows // max(d["chunk"], 1)
            return bool(np.any(d["remote_row_idx"] < sent))

        self.has_remote = any(
            _group_has_remote(g[grp]) for g in stacked for grp in ("loc", "rem")
        )
        # does any block need the gathered x at all? (static: elides gather)
        self.needs_gather = any(g["rem"]["values"].size for g in stacked)

        sh = NamedSharding(mesh, P(axis))

        def put(d):
            return tuple(
                jax.device_put(jnp.asarray(d[k]), sh)
                for k in ("values", "row_idx", "col_idx", "remote_row_idx")
            )

        # x-local blocks consume the shard's own x slice and run while the
        # mesh-wide gather for x-remote blocks is still in flight.
        self.loc_buckets = tuple(put(g["loc"]) for g in stacked if g["loc"]["values"].size)
        self.loc_chunks = tuple(
            g["loc"]["chunk"] for g in stacked if g["loc"]["values"].size
        )
        self.rem_buckets = tuple(put(g["rem"]) for g in stacked if g["rem"]["values"].size)
        self.rem_chunks = tuple(
            g["rem"]["chunk"] for g in stacked if g["rem"]["values"].size
        )
        self._mv_cache: dict[int, object] = {}

    # -- the shard_map kernel ------------------------------------------------
    def _local_apply(self, x_local, *flat_buckets):
        """Runs per shard: x_local [cols_per(, r)] -> y_local [rows_per(, r)].

        Execution order is chosen so XLA's latency-hiding scheduler overlaps
        the ICI all_gather with the x-local block GEMMs: the gather result is
        consumed only by the x-remote group.
        """
        axis = self.axis
        vec = x_local.ndim == 1
        xl = x_local[:, None] if vec else x_local
        r = xl.shape[1]
        acc_dtype = jnp.result_type(self.dtype, xl.dtype)
        # 1. start assembling full x over ICI (consumed only in step 3)
        x_full = (
            jax.lax.all_gather(xl, axis, axis=0, tiled=True)
            if self.needs_gather
            else None
        )
        # sentinel handling: padded gather rows read some in-range x row via
        # clamping, but the padded value lanes are zero so contributions are 0.
        y_local = jnp.zeros((self.rows_per + 1, r), dtype=acc_dtype)
        y_remote = (
            jnp.zeros((self.padded_rows + 1, r), dtype=acc_dtype)
            if self.has_remote
            else None
        )

        it = iter(flat_buckets)

        def consume(src, src_len, chunk, y_local, y_remote):
            # [0] drops the unit shard dimension left by P(axis) sharding
            vals = next(it)[0]
            ridx = next(it)[0]
            cidx = next(it)[0]
            rridx = next(it)[0]
            nbmax, mp, kp = vals.shape
            if chunk > 1:
                C = chunk
                in_rows = src_len - src_len % -C + kp  # round up + window pad
                src2 = jnp.pad(src, ((0, in_rows - src_len), (0, 0))).reshape(
                    in_rows // C, C, r
                )
                xg = src2[cidx].reshape(nbmax, kp, r)
            else:
                src_ext = jnp.concatenate(
                    [src, jnp.zeros((1, r), src.dtype)], axis=0
                )
                xg = src_ext[cidx]  # [nbmax, kp, r]
            yp = jnp.einsum(
                "bmk,bkr->bmr", vals, xg, preferred_element_type=acc_dtype,
                precision=self.precision,
            )
            if chunk > 1:
                C = chunk
                upd = yp.reshape(nbmax, mp // C, C, r)
                y2 = jnp.zeros((self.rows_per // C + 1, C, r), dtype=acc_dtype)
                y2 = y2.at[ridx].add(upd)
                y_local = y_local.at[: self.rows_per].add(
                    y2[: self.rows_per // C].reshape(self.rows_per, r)
                )
                if self.has_remote:
                    y2g = jnp.zeros(
                        (self.padded_rows // C + 1, C, r), dtype=acc_dtype
                    )
                    y2g = y2g.at[rridx].add(upd)
                    y_remote = y_remote.at[: self.padded_rows].add(
                        y2g[: self.padded_rows // C].reshape(self.padded_rows, r)
                    )
            else:
                ypf = yp.reshape(-1, r)
                y_local = y_local.at[ridx.reshape(-1)].add(ypf)
                if self.has_remote:
                    y_remote = y_remote.at[rridx.reshape(-1)].add(ypf)
            return y_local, y_remote

        # 2. x-local blocks: consume the shard's own slice immediately
        for C in self.loc_chunks:
            y_local, y_remote = consume(xl, self.cols_per, C, y_local, y_remote)
        # 3. x-remote blocks: consume the gathered x
        for C in self.rem_chunks:
            y_local, y_remote = consume(
                x_full, self.padded_cols, C, y_local, y_remote
            )

        out = y_local[: self.rows_per]
        if self.has_remote:
            # 4. reduce-scatter remote contributions onto their owners
            remote = jax.lax.psum_scatter(
                y_remote[: self.padded_rows], axis, scatter_dimension=0, tiled=True
            )
            out = out + remote
        return out[:, 0] if vec else out

    def _build_mv(self, ndim):
        if ndim in self._mv_cache:
            return self._mv_cache[ndim]
        axis = self.axis
        nleaves = 4 * (len(self.loc_buckets) + len(self.rem_buckets))
        xspec = P(axis) if ndim == 1 else P(axis, None)

        def body(x_local, *flat):
            return self._local_apply(x_local, *flat)

        fn = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(xspec,) + (P(axis),) * nleaves,
            out_specs=xspec,
        )
        fn = jax.jit(fn)
        self._mv_cache[ndim] = fn
        return fn

    def mv(self, x):
        return self._call(jnp.asarray(x))

    def mm(self, X):
        return self._call(jnp.asarray(X))

    def __matmul__(self, x):
        return self._call(jnp.asarray(x))

    def _call(self, x):
        m, n = self.shape
        if x.shape[0] != n:
            raise ValueError(f"operand length {x.shape[0]} != ncols {n}")
        pad = self.padded_cols - n
        if pad:
            padw = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
            x = jnp.pad(x, padw)
        fn = self._build_mv(x.ndim)
        y = fn(x, *(v for b in self.loc_buckets + self.rem_buckets for v in b))
        return y[:m]

    def matvec_closure(self):
        return lambda x: self.mv(x)


def distribute(op: LinearOperator, mesh: Mesh, axis: str = "rows", **kw):
    """Shard ``op`` block-row-wise over ``mesh[axis]``."""
    return DistributedBlockOperator(op, mesh, axis, **kw)
