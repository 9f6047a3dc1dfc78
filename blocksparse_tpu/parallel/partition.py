"""Block-row partitioning for multi-chip / multi-host execution.

The reference has no distributed backend (its only parallelism is in-process
threading, SURVEY.md §2); the TPU-native scaling strategy (BASELINE.json
north star) is **1-D block-row partitioning**: each of S shards owns a
contiguous range of output rows and every block whose row indices fall in
that range.  A block is assigned to the shard owning its *first* row index;
blocks straddling a shard boundary contribute to remote rows through the
sentinel-extended scatter (handled by psum/reduce-scatter in the shard_map
kernel, see distributed.py).

The partition produces *stacked uniform* per-shard arrays -- every shard gets
the same static shapes (max-padded with sentinel blocks) -- so one
``shard_map`` body serves all shards.  Sentinel blocks have zero values and
out-of-range indices, so they contribute nothing.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["RowPartition", "partition_rows", "stack_buckets"]


@dataclass(frozen=True)
class RowPartition:
    """Row ownership: shard s owns rows [offsets[s], offsets[s+1])."""

    nshards: int
    nrows: int
    offsets: tuple[int, ...]  # length nshards + 1

    def owner_of_row(self, r: int) -> int:
        return int(np.searchsorted(np.asarray(self.offsets), r, side="right") - 1)

    @property
    def shard_rows(self) -> int:
        """Uniform local row count (nrows must divide evenly for shard_map)."""
        sizes = {self.offsets[i + 1] - self.offsets[i] for i in range(self.nshards)}
        assert len(sizes) == 1, "non-uniform partition"
        return int(next(iter(sizes)))


def partition_rows(nrows: int, nshards: int, granule: int = 128) -> RowPartition:
    """Uniform contiguous row partition; nrows is padded up conceptually --
    callers pad x/y to ``offsets[-1]``.  Shard sizes are rounded up to
    ``granule`` so every chunk size C (C divides 128) stays aligned to the
    shard boundaries and chunks never straddle shards."""
    per = -(-(-(-nrows // nshards)) // granule) * granule
    offsets = tuple(i * per for i in range(nshards + 1))
    return RowPartition(nshards=nshards, nrows=nrows, offsets=offsets)


def stack_buckets(layout, part: RowPartition, cols_per: int | None = None):
    """Assign blocks to shards (by first row index) and build stacked
    per-shard bucket arrays with identical static shapes.

    Blocks are additionally split by **x-locality**: a block whose column
    indices all fall inside its owning shard's x range [s*cols_per,
    (s+1)*cols_per) can consume the shard's own x slice directly and does not
    have to wait for the mesh-wide gather of x -- XLA then overlaps the
    collective with these local GEMMs (the "overlapped halo" execution of
    BASELINE.json's north star).  Pass ``cols_per=None`` to disable the split
    (everything lands in the remote group).

    Returns (stacked, padded_rows) where ``stacked`` is a list over buckets
    of dicts with two groups, "loc" and "rem", each containing:
      values  [S, nbmax, mp, kp]
      row_idx [S, nbmax, mp]   LOCAL y rows in [0, shard_rows]; sentinel =
                               shard_rows (dropped accumulator slot)
      remote_row_idx [S, nbmax, mp]  GLOBAL y rows for the psum path;
                                     sentinel = padded nrows
      col_idx [S, nbmax, kp]   "loc": LOCAL x rows (sentinel = cols_per);
                               "rem": GLOBAL x rows (sentinel = ncols)
    """
    S = part.nshards
    rows_per = part.shard_rows
    padded_rows = part.offsets[-1]
    out = []
    for b in layout.buckets:
        nb = b.values.shape[0]
        mp, kp = b.mp, b.kp
        C = int(b.chunk)
        chunked = C > 1 and cols_per is not None and cols_per % C == 0
        owner = np.empty(nb, dtype=np.int64)
        xlocal = np.zeros(nb, dtype=bool)
        for j in range(nb):
            # first REAL row index (slot 0 may be an offset-padding sentinel
            # in chunked buckets; k-merged slots store real rows throughout)
            first = int(b.row_idx[j, int(b.row_off[j])]) if mp else 0
            if first >= layout.nrows:
                first = int(b.row_idx[j, 0])
            s = min(first // rows_per, S - 1)
            owner[j] = s
            if cols_per is None:
                continue
            lo, hi = s * cols_per, (s + 1) * cols_per
            if chunked:
                # the chunk gather reads the whole aligned window
                cs = int(b.col_start[j])
                xlocal[j] = cs >= lo and cs + kp <= hi
            else:
                ci = b.col_idx[j].astype(np.int64)
                real = ci < layout.ncols
                xlocal[j] = bool(np.all((ci[real] >= lo) & (ci[real] < hi)))

        groups = {}
        for key, members in (("loc", xlocal), ("rem", ~xlocal)):
            ids = np.nonzero(members)[0]
            counts = np.bincount(owner[ids], minlength=S) if ids.size else np.zeros(S, int)
            nbmax = int(counts.max()) if ids.size else 0
            values = np.zeros((S, nbmax, mp, kp), dtype=b.values.dtype)
            fill = np.zeros(S, dtype=np.int64)
            if chunked:
                mpc, kpc = mp // C, kp // C
                loc_sent = rows_per // C
                rem_sent = padded_rows // C
                # positional semantics match the element layout:
                # (local-out, in, remote-out) index tables
                row_idx = np.full((S, nbmax, mpc), loc_sent, dtype=np.int32)
                remote_row_idx = np.full((S, nbmax, mpc), rem_sent, dtype=np.int32)
                col_idx = np.zeros((S, nbmax, kpc), dtype=np.int32)
                for j in ids:
                    s = owner[j]
                    slot = fill[s]
                    fill[s] += 1
                    values[s, slot] = b.values[j]
                    cc = b.col_chunk_idx[j].astype(np.int64)
                    col_idx[s, slot] = (
                        cc - (s * cols_per) // C if key == "loc" else cc
                    ).astype(np.int32)
                    rc = b.row_chunk_idx[j].astype(np.int64)
                    local = rc - part.offsets[s] // C
                    owned = (local >= 0) & (local < rows_per // C)
                    row_idx[s, slot] = np.where(owned, local, loc_sent).astype(
                        np.int32
                    )
                    remote_row_idx[s, slot] = np.where(
                        ~owned, rc, rem_sent
                    ).astype(np.int32)
            else:
                row_idx = np.full((S, nbmax, mp), rows_per, dtype=np.int32)
                remote_row_idx = np.full((S, nbmax, mp), padded_rows, dtype=np.int32)
                col_sentinel = cols_per if key == "loc" else layout.ncols
                col_idx = np.full((S, nbmax, kp), col_sentinel, dtype=np.int32)
                for j in ids:
                    s = owner[j]
                    slot = fill[s]
                    fill[s] += 1
                    values[s, slot] = b.values[j]
                    ci = b.col_idx[j].astype(np.int64)
                    if key == "loc":
                        # rebase to the shard's local x slice
                        local_c = ci - s * cols_per
                        local_c = np.where(ci >= layout.ncols, cols_per, local_c)
                        col_idx[s, slot] = local_c.astype(np.int32)
                    else:
                        col_idx[s, slot] = ci.astype(np.int32)
                    gr = b.row_idx[j].astype(np.int64)
                    is_sentinel = gr >= layout.nrows
                    local = gr - part.offsets[s]
                    owned = (~is_sentinel) & (local >= 0) & (local < rows_per)
                    row_idx[s, slot] = np.where(owned, local, rows_per).astype(
                        np.int32
                    )
                    remote = (~is_sentinel) & (~owned)
                    remote_row_idx[s, slot] = np.where(
                        remote, gr, padded_rows
                    ).astype(np.int32)
            groups[key] = dict(
                values=values,
                row_idx=row_idx,
                col_idx=col_idx,
                remote_row_idx=remote_row_idx,
                chunk=C if chunked else 1,
            )
        out.append(groups)
    return out, padded_rows
