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


def partition_rows(nrows: int, nshards: int) -> RowPartition:
    """Uniform contiguous row partition; nrows is padded up conceptually --
    callers pad x/y to ``offsets[-1]``."""
    per = -(-nrows // nshards)
    offsets = tuple(min(i * per, max(nrows, per * nshards)) for i in range(nshards + 1))
    # keep uniform: use per*nshards as padded length
    offsets = tuple(i * per for i in range(nshards + 1))
    return RowPartition(nshards=nshards, nrows=nrows, offsets=offsets)


def stack_buckets(layout, part: RowPartition):
    """Assign blocks to shards (by first row index) and build stacked
    per-shard bucket arrays with identical static shapes.

    Returns a list over buckets of dicts with:
      values  [S, nbmax, mp, kp]
      row_idx [S, nbmax, mp]   (LOCAL row ids in [0, shard_rows]; sentinel =
                                shard_rows -- rows owned by other shards are
                                routed through the remote-contribution slot)
      col_idx [S, nbmax, kp]   (GLOBAL col ids; sentinel = ncols)
      remote_row_idx [S, nbmax, mp]  (GLOBAL row ids for psum path; sentinel
                                      = padded nrows)
    plus the padded global row length.
    """
    S = part.nshards
    rows_per = part.shard_rows
    padded_rows = part.offsets[-1]
    out = []
    for b in layout.buckets:
        nb = b.values.shape[0]
        owner = np.empty(nb, dtype=np.int64)
        for j in range(nb):
            first = int(b.row_idx[j, 0]) if b.values.shape[1] else 0
            owner[j] = min(first // rows_per, S - 1)
        counts = np.bincount(owner, minlength=S)
        nbmax = int(counts.max()) if nb else 0
        mp, kp = b.mp, b.kp
        values = np.zeros((S, nbmax, mp, kp), dtype=b.values.dtype)
        # sentinel local row = rows_per (dropped slot of local accumulator)
        row_idx = np.full((S, nbmax, mp), rows_per, dtype=np.int32)
        remote_row_idx = np.full((S, nbmax, mp), padded_rows, dtype=np.int32)
        col_idx = np.full((S, nbmax, kp), layout.ncols, dtype=np.int32)
        fill = np.zeros(S, dtype=np.int64)
        for j in range(nb):
            s = owner[j]
            slot = fill[s]
            fill[s] += 1
            values[s, slot] = b.values[j]
            col_idx[s, slot] = b.col_idx[j]
            gr = b.row_idx[j].astype(np.int64)
            is_sentinel = gr >= layout.nrows
            local = gr - part.offsets[s]
            owned = (~is_sentinel) & (local >= 0) & (local < rows_per)
            # rows owned by this shard -> local accumulator
            row_idx[s, slot] = np.where(owned, local, rows_per).astype(np.int32)
            # rows owned elsewhere -> global remote accumulator (psum path)
            remote = (~is_sentinel) & (~owned)
            remote_row_idx[s, slot] = np.where(remote, gr, padded_rows).astype(np.int32)
        out.append(
            dict(
                values=values,
                row_idx=row_idx,
                col_idx=col_idx,
                remote_row_idx=remote_row_idx,
            )
        )
    return out, padded_rows
