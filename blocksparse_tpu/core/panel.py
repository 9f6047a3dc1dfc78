"""Panel layout: K-merged row-group canvases on the [8,128] tile grid.

Round-3 performance layer closing the padding gap VERDICT r2 #1 measured on
the strip/slab plan (padded/logical 2.3-2.9x for BEM-like mixed-size
populations).  The slab plan (core/strip.py) keeps every block in REAL
column coordinates, so a ~85-wide block at an arbitrary offset covers ~1.7
lane chunks (128 lanes each) and the value stream dilutes ~2.5x.  Here the
column dimension is re-indexed instead:

  * all blocks sharing one row index range concatenate along K into a
    **panel** -- a dense [H, W] canvas whose lanes are panel-local;
  * the input vector is pre-gathered OUTSIDE the kernel into panel order
    (one tiny XLA gather: the index table is one int32 per panel lane,
    ~1/8 of one tile row of values), so the kernel's gather is exact and
    sequential;
  * panels pack back-to-back in a global panel-K space (bases 128-aligned),
    and the whole operand streams as [8, 128] tiles exactly like the slab
    kernel -- measured padded/logical drops to ~1.2-1.35 on the BASELINE
    configs that motivated this (bench.py configs 2, 3, S).

Scattered index lists need no special casing on the column side -- the
pre-gather handles ANY list (the reference's sorted-but-non-contiguous BEM
gather lists, SURVEY.md §4) at zero kernel cost.  Scattered ROW lists embed
span-dense exactly as the slab plan does (zero [8,128] row strips are
skipped).

Symmetric fusion (one value read -> forward + mirrored contribution,
vs the reference reading each stored off-diagonal twice,
/root/reference/src/symmetricblockmatrix.jl:394-418) works in panel space:
mirror entries align to 32-lane segments, the kernel emits per-slab mirror
panels, and a small one-hot SEGMENT matmul maps panel segments back to a
32-aligned concatenation of the distinct column ranges (the "range space"),
from which the real output is one gather.  Diagonal blocks simply have no
rows in that one-hot, so their (harmless) in-kernel mirror product is
dropped -- no per-tile flag needed.

Gather/scatter tables are per-slab chunk-compacted: the kernel reads a
[CW, 128] pre-gathered x panel per slab (CW = max distinct lane chunks any
slab touches), so aux traffic stays at a few % of the value stream even for
hundreds of distinct chunks.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from .layout import BlockLayout, is_contiguous
from .strip import CC, RC, _tiles_from_blocks

__all__ = ["PanelPlan", "build_panel_plan", "panel_plan_from_layout",
           "panel_plan_symmetric", "SEG"]

SEG = 32          # mirror scatter segment (lanes); mirror slots align to it
_ROW_COVER_CAP = 3.2   # scattered rows: max tile-cover dilution
_MAX_CANVAS = 1 << 26  # per-panel canvas element cap (host memory guard)


@dataclass(frozen=True)
class PanelPlan:
    """Host-side panel plan; hashable by content digest (jit-cache safe)."""

    nrows: int
    ncols: int          # REAL input length (xidx indexes [0, ncols])
    S: int              # slabs
    TS: int             # tiles per slab (adaptive; max real slab size)
    CW: int             # compacted lane chunks per slab
    RW: int             # row-chunk window (adaptive)
    n8p: int            # output row chunks
    mirror: bool
    vals: np.ndarray    # [S*TS, RC, CC] f32
    rs: np.ndarray      # [S, RW, TS] f32 one-hot (device: bf16)
    cs: np.ndarray      # [S, TS, CW] f32 one-hot (device: bf16)
    xidx: np.ndarray    # [S, CW*CC] int32 into x; sentinel == ncols
    b8: np.ndarray      # [S] int32 first row chunk per slab
    nt: int             # real (non-padding) tile count
    # mirror-only leaves (None otherwise)
    omap: np.ndarray | None   # [S*CW*(CC//SEG), NS] one-hot (device: bf16)
    yback: np.ndarray | None  # [nrows] int32 into range space; sentinel NS*SEG
    NS: int = 0               # range-space segments
    _digest: str = field(default="", compare=False)

    def __post_init__(self):
        if not self._digest:
            h = hashlib.sha256()
            h.update(np.int64([self.nrows, self.ncols, self.S, self.TS,
                               self.CW, self.RW, self.n8p, int(self.mirror),
                               self.NS]).tobytes())
            h.update(np.ascontiguousarray(self.vals).tobytes())
            h.update(np.ascontiguousarray(self.xidx).tobytes())
            h.update(np.ascontiguousarray(self.b8).tobytes())
            if self.yback is not None:
                h.update(np.ascontiguousarray(self.yback).tobytes())
            object.__setattr__(self, "_digest", h.hexdigest())

    def __hash__(self):
        return hash(self._digest)

    def __eq__(self, other):
        return isinstance(other, PanelPlan) and self._digest == other._digest

    @property
    def tile_bytes(self) -> int:
        return int(self.vals.size * 4)

    @property
    def aux_bytes(self) -> int:
        """Streamed per product: one-hots (bf16) + per-slab gathered x."""
        a = (self.rs.size + self.cs.size) * 2 + self.xidx.size * 4
        if self.omap is not None:
            a += self.omap.size * 2
        return int(a)


def _canonical_rows(rows: np.ndarray):
    """(r0, height, embed_fn) for a row index list.

    Contiguous lists map 1:1; scattered lists embed span-dense (the cover's
    all-zero [8,128] strips are dropped later by the tiler).  Returns None
    when the 8-row cover dilutes the list beyond _ROW_COVER_CAP.
    """
    r = np.asarray(rows, np.int64)
    if is_contiguous(r):
        return int(r[0]), r.size, None
    r0 = int(r.min())
    span = int(r.max()) - r0 + 1
    cover8 = np.unique(r // RC).size * RC
    if cover8 > _ROW_COVER_CAP * max(1, r.size):
        return None
    return r0, span, (r - r0)


def build_panel_plan(entries, shape, *, mirror: bool = False,
                     TS_max: int = 512):
    """Build a PanelPlan from entries ``(block, rows, cols, is_mirror)``.

    ``block``  : 2-D float32 values [len(rows), len(cols)]
    ``rows``   : output row index list (any order; scattered allowed)
    ``cols``   : input column index list (ANY list -- pre-gathered)
    ``is_mirror``: True for stored symmetric off-diagonals (their transposed
                 contribution is emitted by the fused kernel); requires
                 ``mirror=True`` plan, contiguous ``cols``, and pairwise
                 disjoint-or-identical mirror column ranges.

    Returns None when the population is ineligible (dtype, row dilution,
    overlapping mirror ranges, empty).
    """
    nrows, ncols = map(int, shape)
    if mirror and nrows != ncols:
        return None

    # -- group entries into panels by identical row lists -------------------
    panels: dict = {}
    mirror_ranges: dict = {}   # (c0, w) -> ñ slot base (filled later)
    canon = []
    for blk, rows, cols, is_m in entries:
        blk = np.asarray(blk, np.float32)
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        if blk.size == 0:
            continue
        cr = _canonical_rows(rows)
        if cr is None:
            return None
        if is_m:
            if not mirror or not is_contiguous(cols):
                return None
            mirror_ranges[(int(cols[0]), cols.size)] = -1
        key = (cr[0], rows.tobytes())
        canon.append((key, cr, blk, cols, bool(is_m)))
        panels.setdefault(key, []).append(len(canon) - 1)
    if not canon:
        return None

    if mirror and not mirror_ranges:
        mirror = False  # no stored off-diagonals: plain (diag-only) plan

    # -- mirror range space: distinct contiguous col ranges, SEG-aligned ----
    NS = 0
    yback = None
    if mirror:
        ranges = sorted(mirror_ranges)
        pos = 0
        last_end = -1
        for c0, w in ranges:
            if c0 < last_end:
                return None  # overlapping distinct ranges: ineligible
            last_end = c0 + w
            mirror_ranges[(c0, w)] = pos
            pos += -(-w // SEG) * SEG
        NS = pos // SEG
        yback = np.full(nrows, NS * SEG, np.int32)
        for (c0, w), base in mirror_ranges.items():
            yback[c0:c0 + w] = base + np.arange(w, dtype=np.int32)

    # -- pack each panel's blocks along K; build canvases -------------------
    # panel K slots align to SEG when the plan fuses a mirror pass (so the
    # mirror map stays segment-exact); plain plans pack densely.
    align = SEG if mirror else 1
    order = sorted(panels, key=lambda k: k[0])
    tile_entries = []       # (canvas, rowstart, global K offset)
    xidx_chunks = []        # per global chunk: [CC] int32 (sentinel ncols)
    segmap = []             # per global seg: target range-space seg or -1
    kbase = 0               # global K cursor (panel bases 128-aligned)
    for key in order:
        ids = panels[key]
        r0, H, emb = canon[ids[0]][1]
        W = 0
        slots = []
        for i in ids:
            w = canon[i][3].size
            W = -(-W // align) * align
            slots.append(W)
            W += w
        Wp = -(-W // CC) * CC
        if H * Wp > _MAX_CANVAS:
            return None
        canvas = np.zeros((H, Wp), np.float32)
        cidx = np.full(Wp, ncols, np.int32)
        psegs = np.full(Wp // SEG, -1, np.int64) if mirror else None
        for i, off in zip(ids, slots):
            _, cr, blk, cols, is_m = canon[i]
            w = cols.size
            if emb is None:
                canvas[:, off:off + w] += blk
            else:
                np.add.at(canvas, (emb[:, None],
                                   np.arange(off, off + w)[None, :]), blk)
            cidx[off:off + w] = cols.astype(np.int32)
            if is_m:
                base = mirror_ranges[(int(cols[0]), w)]
                nseg = -(-w // SEG)
                psegs[off // SEG:off // SEG + nseg] = (
                    base // SEG + np.arange(nseg))
        tile_entries.append((canvas, r0, kbase))
        for j in range(Wp // CC):
            xidx_chunks.append(cidx[j * CC:(j + 1) * CC])
            if mirror:
                segmap.extend(psegs[j * (CC // SEG):(j + 1) * (CC // SEG)])
        kbase += Wp

    built = _tiles_from_blocks([(c, r, k, 0.0) for c, r, k in tile_entries])
    if built is None:
        return None
    tiles, rid, cid, _ = built
    nt = tiles.shape[0]
    n8 = -(-nrows // RC)

    # -- adaptive slab cuts: pick the (RW, cuts) with the least total bytes -
    best = None
    for RW in (16, 32, 64, 128):
        if RW > max(n8, 16):
            continue
        slabs = []
        s0 = 0
        while s0 < nt:
            s1 = min(s0 + TS_max, nt)
            lo = int(rid[s0])
            if int(rid[s1 - 1]) - lo >= RW:
                s1 = s0 + int(np.searchsorted(rid[s0:s1], lo + RW, "left"))
            slabs.append((s0, s1))
            s0 = s1
        TS = -(-max(b - a for a, b in slabs) // 8) * 8
        S = len(slabs)
        cw = 8
        for a, b in slabs:
            cw = max(cw, -(-np.unique(cid[a:b]).size // 8) * 8)
        bytes_ = S * TS * RC * CC * 4 + S * (RW * TS + TS * cw) * 2 \
            + S * cw * CC * 4
        if best is None or bytes_ < best[0]:
            best = (bytes_, RW, TS, S, cw, slabs)
    if best is None:
        return None
    _, RW, TS, S, CW, slabs = best
    n8p = max(n8, RW)

    xchunks = np.stack(xidx_chunks)          # [K̂, CC]
    vals = np.zeros((S * TS, RC, CC), np.float32)
    rs = np.zeros((S, RW, TS), np.float32)
    cs = np.zeros((S, TS, CW), np.float32)
    xidx = np.full((S, CW * CC), ncols, np.int32)
    b8 = np.zeros((S,), np.int32)
    omap = (np.zeros((S * CW * (CC // SEG), NS), np.float32)
            if mirror else None)
    segarr = np.asarray(segmap, np.int64) if mirror else None
    for si, (a, b) in enumerate(slabs):
        cnt = b - a
        base = min(int(rid[a]), n8p - RW)
        b8[si] = base
        vals[si * TS:si * TS + cnt] = tiles[a:b]
        rs[si, rid[a:b] - base, np.arange(cnt)] = 1.0
        uniq, inv = np.unique(cid[a:b], return_inverse=True)
        cs[si, np.arange(cnt), inv] = 1.0
        xidx[si, :uniq.size * CC] = xchunks[uniq].reshape(-1)
        if mirror:
            nsg = CC // SEG
            for ci, gchunk in enumerate(uniq):
                for q in range(nsg):
                    t = segarr[gchunk * nsg + q]
                    if t >= 0:
                        omap[(si * CW + ci) * nsg + q, t] = 1.0

    return PanelPlan(
        nrows=nrows, ncols=ncols, S=S, TS=TS, CW=CW, RW=RW, n8p=n8p,
        mirror=bool(mirror), vals=vals, rs=rs, cs=cs, xidx=xidx, b8=b8,
        nt=nt, omap=omap, yback=yback, NS=NS,
    )


def _layout_entries(layout: BlockLayout, *, transpose: bool,
                    is_mirror: bool = False):
    out = []
    for i in range(layout.nblocks):
        r = layout.rowindices[i]
        c = layout.colindices[i]
        if r.size == 0 or c.size == 0:
            continue
        blk = layout.extract_block(i)
        if transpose:
            out.append((blk.T, c, r, is_mirror))
        else:
            out.append((blk, r, c, is_mirror))
    return out


def panel_plan_from_layout(layout: BlockLayout, *, transpose: bool = False,
                           TS_max: int = 512):
    """General (non-symmetric) panel plan; None if ineligible."""
    if layout.nblocks == 0:
        return None
    dt = np.result_type(*[b.values.dtype for b in layout.buckets])
    if dt != np.float32:
        return None
    shape = ((layout.ncols, layout.nrows) if transpose
             else (layout.nrows, layout.ncols))
    return build_panel_plan(
        _layout_entries(layout, transpose=transpose), shape, mirror=False,
        TS_max=TS_max)


def panel_plan_symmetric(dlayout: BlockLayout, olayout: BlockLayout, *,
                         transpose_diag: bool = False, TS_max: int = 512):
    """Fused symmetric panel plan: S = D + O + O^T in one kernel launch.

    ``transpose_diag`` builds the S^T variant (diagonal blocks transpose;
    the off-diagonal pair is transpose-invariant,
    /root/reference/src/symmetricblockmatrix.jl:219-237).
    """
    dts = [b.values.dtype for b in dlayout.buckets] + [
        b.values.dtype for b in olayout.buckets]
    if dts and np.result_type(*dts) != np.float32:
        return None
    entries = (_layout_entries(dlayout, transpose=transpose_diag)
               + _layout_entries(olayout, transpose=False, is_mirror=True))
    return build_panel_plan(entries, (dlayout.nrows, dlayout.ncols),
                            mirror=True, TS_max=TS_max)
