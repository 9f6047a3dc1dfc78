"""Patch-merged layout: ragged row-window merge with chunk-exact column cover.

Round-3 performance layer for heterogeneous *contiguous-range* block
populations (the reference's VBCRS / grouped-BEM case: ~50-300 blocks with
sizes 16-285, /root/reference/src/vbcrs.jl:36-43, docs/src/vbcrs.md).  The
round-2 shape buckets pad every block to a pow2 tile, which streams 2.6-2.8x
the logical bytes on BASELINE configs 2-3 (VERDICT r2 weak #1).  Here blocks
are instead merged into **patch slots**:

  - all blocks sharing one output row range concatenate along k, each member
    placed at its exact cover of CC-wide column chunks (CC = 32): per-member
    waste is only the partial first/last chunk;
  - a slot's k-extent is padded to its bucket's chunk-count class with
    *sentinel* chunks (gather index NC reads a zero chunk; values zero);
  - bucket k-classes are multiples of 128/CC lanes so the value stream is
    **lane-dense** in HBM (minor dims that are not 128-multiples physically
    occupy padded tiles -- measured 2x for minor dim 64,
    benchmarks/archive/proto_r3_floor.py);
  - slot counts are padded to the bucket's grid group size G with zero slots
    so the Pallas mono-kernel's grid tiles evenly.

Gather/scatter run as **one-hot matmuls** (exact: 0/1 one-hots in bf16
against f32 at HIGHEST decompose to bf16x3 whose single nonzero term
reconstructs the f32 operand bit-exactly) on the SpMV path, and as
scalar-prefetched dynamic slices inside the SpMM mono-kernel
(ops/patch_engine.py).

Symmetric support: members are ordered mirrored-first inside each slot and
``mirror_kc[slot]`` counts the leading k-chunks whose transposed
contribution must also be emitted (the fused one-read pass; the reference
reads each stored off-diagonal twice, /root/reference/src/
symmetricblockmatrix.jl:394-418).

Eligibility: f32 values, contiguous row and column index lists.  Scattered
lists stay on the bucket/slab engines.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from .layout import BlockLayout, is_contiguous, round_up

__all__ = ["PatchPlan", "PatchBucket", "build_patch_plan", "one_hot_arrays",
           "CC", "CR"]

CC = 32   # column chunk width (gather granularity)
CR = 8    # row chunk width (scatter granularity)
LANE = 128
KC_ALIGN = LANE // CC   # k chunk counts padded to this so KP % 128 == 0

_MAX_KP = 4096          # canvas k-extent cap (VMEM per grid step)
_STEP_BYTES = 600_000   # target value bytes per mono-kernel grid step
_SLOT_TAX = 512         # cost-model bytes per canvas (per-slot loop overhead)


@dataclass(frozen=True)
class PatchBucket:
    """One size class of merged slots (nb is padded to a multiple of G).

    vals      : [nb, MP, KP] f32, lane-dense (KP % 128 == 0)
    col_chunk : [nb, KC] int32 -- CC-chunk id per k-chunk, sentinel NC
    row_chunk : [nb, MC] int32 -- CR-chunk id per m-chunk, sentinel NR
    row_start : [nb] int32 -- element start of the slot's row window
                (padded slots point at an in-bounds zero region)
    mirror_kc : [nb] int32 -- leading k-chunks with a mirrored (transposed)
                contribution; 0 for plain operands / diagonal-only slots
    G         : grid group size of the mono-kernel (nb % G == 0)
    """

    MP: int
    KP: int
    G: int
    vals: np.ndarray
    col_chunk: np.ndarray
    row_chunk: np.ndarray
    row_start: np.ndarray
    mirror_kc: np.ndarray

    @property
    def nb(self) -> int:
        return int(self.vals.shape[0])

    @property
    def KCn(self) -> int:
        return self.KP // CC

    @property
    def MCn(self) -> int:
        return self.MP // CR


@dataclass(frozen=True)
class PatchPlan:
    """Host-side merged-patch plan for one operand (hashable by digest)."""

    nrows: int
    ncols: int
    buckets: tuple[PatchBucket, ...]
    symmetric: bool          # fused mirror pass present
    logical_nnz: int
    _digest: str = field(default="", compare=False)

    def __post_init__(self):
        if not self._digest:
            h = hashlib.sha256()
            h.update(np.int64([self.nrows, self.ncols,
                               int(self.symmetric)]).tobytes())
            for b in self.buckets:
                h.update(np.int64([b.MP, b.KP, b.G]).tobytes())
                h.update(np.ascontiguousarray(b.vals).tobytes())
                h.update(np.ascontiguousarray(b.col_chunk).tobytes())
                h.update(np.ascontiguousarray(b.row_chunk).tobytes())
                h.update(np.ascontiguousarray(b.mirror_kc).tobytes())
            object.__setattr__(self, "_digest", h.hexdigest())

    def __hash__(self):
        return hash(self._digest)

    def __eq__(self, other):
        return isinstance(other, PatchPlan) and self._digest == other._digest

    @property
    def padded_nnz(self) -> int:
        return int(sum(b.vals.size for b in self.buckets))

    @property
    def NC(self) -> int:
        return -(-self.ncols // CC)

    @property
    def NR(self) -> int:
        return -(-self.nrows // CR)

    @property
    def MC_max(self) -> int:
        return max((b.MCn for b in self.buckets), default=1)

    @property
    def value_bytes(self) -> int:
        return int(sum(b.vals.size * b.vals.dtype.itemsize
                       for b in self.buckets))

    @property
    def aux_bytes(self) -> int:
        """Per-product streamed one-hot bytes (bf16, SpMV path)."""
        tot = 0
        for b in self.buckets:
            tot += b.nb * b.KCn * (self.NC + 1) * 2   # gather one-hot
            tot += b.nb * b.MCn * (self.NR + 1) * 2   # scatter one-hot
        return int(tot)


def build_patch_plan(layout: BlockLayout,
                     extra_layout: BlockLayout | None = None,
                     force_canvas: tuple[int, int] | None = None,
                     force_G: int | None = None,
                     transpose_main: bool = False,
                     optimize: str | None = None):
    """Build a PatchPlan from one layout (or a diag+offdiag pair).

    ``extra_layout``: when given, ``layout`` is the DIAGONAL operand and
    ``extra_layout`` the stored OFF-DIAGONAL operand of a symmetric matrix;
    both merge into one plan whose off-diagonal chunks are mirror-counted
    (fused S = D + O + O^T in one pass).  Returns None when ineligible
    (non-f32 values, any non-contiguous index list, or an oversized block).

    ``transpose_main``: embed the transpose of ``layout``'s blocks (indices
    swapped).  Used for S^T = D^T + O + O^T: the off-diagonal pair is
    transpose-invariant, only the diagonal operand transposes (the
    reference's role swap, symmetricblockmatrix.jl:341-365).  Plain
    operands do NOT need this -- their transpose swaps gather/scatter roles
    over the same plan inside the engine.

    ``optimize``: "auto" | "latency" | "throughput" | None -- the
    plan-shape bias carried as OPERATOR DATA (round 5; previously only
    the process-global BST_OPT env var).  None falls back to the env var,
    then "auto".  auto/latency pick an EVEN grid-step count around 2-8:
    even counts pipeline the double-buffered value-stream DMA fully
    behind the MXU inside one dependent product (measured config4 dep
    16.1 -> 11.3 us at 2 steps; ODD step counts measure 15-17 us --
    benchmarks/proto_r5_spmm.py, proto_r5_spmm2.py).  "throughput"
    restores the padded-bytes step-count search (~0.5 us/product cheaper
    piped on config4, much slower dependent chains).
    """
    dts = [b.values.dtype for b in layout.buckets]
    if extra_layout is not None:
        dts += [b.values.dtype for b in extra_layout.buckets]
    if dts and np.result_type(*dts) != np.float32:
        return None

    entries = []   # (block values f32, row_start, col_start, mirrored)

    def collect(lay: BlockLayout, mirrored: bool, transposed: bool) -> bool:
        for i in range(lay.nblocks):
            r = lay.rowindices[i]
            c = lay.colindices[i]
            if r.size == 0 or c.size == 0:
                continue
            if not (is_contiguous(r) and is_contiguous(c)):
                return False
            blk = np.asarray(lay.extract_block(i), np.float32)
            if transposed:
                blk, r, c = blk.T, c, r
            entries.append((blk, int(r[0]), int(c[0]), mirrored))
        return True

    if not collect(layout, False, transpose_main):
        return None
    if extra_layout is not None and not collect(extra_layout, True, False):
        return None
    if not entries:
        return None

    nrows, ncols = layout.nrows, layout.ncols
    if transpose_main:
        nrows, ncols = ncols, nrows
    NC = -(-ncols // CC)
    NR = -(-nrows // CR)
    logical = sum(b.shape[0] * b.shape[1] for b, _, _, _ in entries)
    symmetric = extra_layout is not None

    # -- uniform canvas -------------------------------------------------------
    # Every slot is normalized onto ONE canvas shape [MP*, KC* chunks]:
    # blocks split freely along rows (window tiles anchored at the block's
    # CR-aligned start) and along column chunks, so the plan always has
    # exactly ONE bucket.  Rationale: per-product op/launch count is the
    # dominant cost for heterogeneous populations on TPU (37 near-singleton
    # buckets measured 16% of wire rate; 1 bucket of the same bytes 71% --
    # benchmarks/archive/proto_r3_patch.py), and row/chunk splits are free (a window
    # piece scatters to its own rows; a chunk range gathers its own chunks).
    # (MP*, KC*) come from an exact cost search over the population.

    def block_kc(j):
        blk, rs, cs, mi = entries[j]
        return int(-(-((cs % CC) + blk.shape[1]) // CC))

    def window_groups(MPc):
        """window start -> list of (entry j, piece row range)."""
        groups: dict[int, list[tuple[int, int, int]]] = {}
        for j, (blk, rs, cs, mi) in enumerate(entries):
            a = rs - rs % CR
            h = blk.shape[0]
            t = 0
            while a + t * MPc < rs + h:
                w0 = a + t * MPc
                lo = max(rs, w0)
                hi = min(rs + h, w0 + MPc)
                if hi > lo:
                    groups.setdefault(w0, []).append((j, lo, hi))
                t += 1
        return groups

    mp_cands = [m for m in (8, 16, 24, 32, 48, 64, 96, 128, 192, 256)
                if m % CR == 0]
    kc_cands = [k for k in (4, 8, 12, 16, 24, 32, 48, 64)
                if k % KC_ALIGN == 0 and k * CC <= _MAX_KP]
    best = None
    for MPc in mp_cands:
        groups = window_groups(MPc)
        kc_per_group = [sum(block_kc(j) for j, _, _ in g)
                        for g in groups.values()]
        for KCc in kc_cands:
            canvases = sum(-(-k // KCc) for k in kc_per_group)
            vbytes = canvases * MPc * KCc * CC * 4
            aux = canvases * (KCc * (NC + 1) + (MPc // CR) * (NR + 1)) * 2
            # per-slot overhead: small slots execute inefficiently (measured
            # canvas sweep, benchmarks/archive/proto_r3_canvas.py)
            cost = vbytes + aux + canvases * _SLOT_TAX
            if best is None or cost < best[0]:
                best = (cost, MPc, KCc)
    _, MP, KCn = best
    if force_canvas is not None:
        MP, KCn = force_canvas
    KP = KCn * CC

    # -- emit slots -----------------------------------------------------------
    # Walk each window group's members (mirrored first, so mirror chunks are
    # a prefix of every canvas), cutting canvases of KC* chunks; a member
    # whose chunk cover exceeds the remaining space splits by chunk range.
    slot_rows = []   # (w0, [(j, lo, hi, q0, q1)], nmir_chunks)
    groups = window_groups(MP)
    for w0, pieces in sorted(groups.items()):
        pieces = sorted(pieces, key=lambda p: not entries[p[0]][3])
        cur, used, curmir = [], 0, 0
        for j, lo, hi in pieces:
            kc_b = block_kc(j)
            mi = entries[j][3]
            q0 = 0
            while q0 < kc_b:
                if used == KCn:
                    slot_rows.append((w0, cur, curmir))
                    cur, used, curmir = [], 0, 0
                take = min(kc_b - q0, KCn - used)
                if take < kc_b - q0 and used > 0 and q0 == 0 \
                        and kc_b <= KCn:
                    # member fits a fresh canvas: avoid mid-member split
                    slot_rows.append((w0, cur, curmir))
                    cur, used, curmir = [], 0, 0
                    take = kc_b
                cur.append((j, lo, hi, q0, q0 + take))
                if mi:
                    curmir += take
                used += take
                q0 += take
        if cur:
            slot_rows.append((w0, cur, curmir))

    # G must be a multiple of 8 when possible: the r=1 mono-kernel blocks
    # the per-slot arrays [nb, MP] / [nb, KP] as (G, MP) / (G, KP), and
    # Mosaic requires the second-to-last block dim to be sublane-divisible
    # (the leading dim of the 3-D vals block is unconstrained).  Search the
    # step count for the cheapest (zero-slot padded bytes + per-step tax)
    # subject to the per-step VMEM budget; zero slots stream real bytes, so
    # padding is charged at full canvas cost.
    canvas_b = MP * KP * 4
    nb_real = len(slot_rows)
    # Plan bias resolution: operator data (optimize=) > BST_OPT env >
    # "auto" (the even-step plan below, which dominates on the measured
    # populations).  "throughput" restores the old step-count search.
    import os as _os

    if optimize is None:
        optimize = _os.environ.get("BST_OPT", "auto")
    if force_G is not None:
        # validate at plan time rather than surfacing a Mosaic compile
        # error: the r=1 mono-kernel needs a sublane-divisible G, and the
        # step working set must fit the VMEM budget
        G = max(8, round_up(int(force_G), 8))
        if canvas_b * G > 4 * _STEP_BYTES:
            raise ValueError(
                f"force_G={force_G}: step working set {canvas_b * G} B "
                f"exceeds the {4 * _STEP_BYTES} B VMEM budget for canvas "
                f"{MP}x{KP}"
            )
        steps = -(-nb_real // G)
    elif optimize != "throughput" and canvas_b * 8 <= 4 * _STEP_BYTES and (
            round_up(max(1, -(-nb_real // 8)), 8) * canvas_b
            <= 4 * _STEP_BYTES):
        # auto/latency default (round 5): EVEN step counts pipeline the
        # double-buffered value DMA fully behind the MXU inside ONE
        # product; odd counts measure 4-5 us slower on config4 (4 steps:
        # dep 11.7 us vs 5 steps: 16.2; 2 steps: 11.3 = 80% of roofline
        # -- benchmarks/proto_r5_spmm.py / proto_r5_spmm2.py).  This
        # dominates the old 3-step throughput search (dep 16.1 -> 11.3 us
        # for a ~0.5 us piped cost), so it is the DEFAULT; construct with
        # optimize="throughput" to get the piped-minimal search back.
        g_cap = max(8, (4 * _STEP_BYTES // canvas_b) // 8 * 8)
        G = steps = None
        for target in (2, 4, 6, 8):
            g = round_up(max(1, -(-nb_real // target)), 8)
            # zero-slot padding streams real bytes: cap it at ~25%
            if g <= g_cap and target * g <= nb_real + max(8, nb_real // 4):
                G, steps = g, target
                break
        if G is None:
            G = min(g_cap, round_up(nb_real, 8))
            steps = -(-nb_real // G)
    elif canvas_b * 8 <= 4 * _STEP_BYTES:
        # G multiples of 8 fit the VMEM budget: search step counts for the
        # cheapest padded-bytes + per-step tax
        g_cap = max(8, (4 * _STEP_BYTES // canvas_b) // 8 * 8)
        steps_lo = max(1, -(-nb_real // g_cap))
        steps_hi = max(steps_lo, -(-nb_real // 8))
        best_g = None
        for steps in range(steps_lo, steps_hi + 1):
            g = round_up(-(-nb_real // steps), 8)
            if g > g_cap:
                continue
            cost = steps * g * canvas_b + steps * 16_384
            if best_g is None or cost < best_g[0]:
                best_g = (cost, g, steps)
        _, G, steps = best_g
    else:
        # canvas too large for a sublane-divisible G: the r=1 kernel path
        # refuses (patch_kernel_ok) and products run the one-hot XLA engine
        G = max(1, _STEP_BYTES // canvas_b)
        G = min(G, nb_real)
        steps = -(-nb_real // G)
        G = -(-nb_real // steps)
    nb = steps * G
    MCn = MP // CR
    vals = np.zeros((nb, MP, KP), np.float32)
    colc = np.full((nb, KCn), NC, np.int32)        # sentinel -> zero chunk
    rowc = np.full((nb, MCn), NR, np.int32)        # sentinel -> dropped
    rstart = np.zeros((nb,), np.int32)             # padded slots: zero window
    mirkc = np.zeros((nb,), np.int32)
    for si, (w0, mem, nmir) in enumerate(slot_rows):
        rstart[si] = w0
        mc_real = -(-min(MP, max(nrows - w0, 0)) // CR)
        rowc[si, :mc_real] = w0 // CR + np.arange(mc_real)
        mirkc[si] = nmir
        kpos = 0
        for (j, lo, hi, q0, q1) in mem:
            blk, rs, cs, mi = entries[j]
            c_off = cs % CC
            # column range of chunks [q0, q1) within the block's cover
            cl = max(0, q0 * CC - c_off)
            ch = min(blk.shape[1], q1 * CC - c_off)
            sub = blk[lo - rs:hi - rs, cl:ch]
            place_off = c_off if q0 == 0 else 0
            vals[si, lo - w0:hi - w0,
                 kpos * CC + place_off: kpos * CC + place_off + sub.shape[1]
                 ] += sub
            colc[si, kpos:kpos + (q1 - q0)] = (
                cs // CC + q0 + np.arange(q1 - q0))
            kpos += q1 - q0

    bucket = PatchBucket(MP=MP, KP=KP, G=G, vals=vals, col_chunk=colc,
                         row_chunk=rowc, row_start=rstart, mirror_kc=mirkc)
    return PatchPlan(
        nrows=nrows, ncols=ncols, buckets=(bucket,),
        symmetric=symmetric, logical_nnz=int(logical),
    )


def one_hot_arrays(plan: PatchPlan):
    """Host one-hots per bucket: (gOH [nb*KC, NC+1], sOH [nb*MC, NR+1],
    mirror flag [nb, KC]).

    Sentinel chunk ids (NC / NR) map to the trailing column: a sentinel
    gather row reads the zero pad chunk, a sentinel scatter row lands in the
    dropped slot.
    """
    NC, NR = plan.NC, plan.NR
    out = []
    for b in plan.buckets:
        g = np.zeros((b.nb * b.KCn, NC + 1), np.float32)
        g[np.arange(b.nb * b.KCn), b.col_chunk.reshape(-1)] = 1.0
        s = np.zeros((b.nb * b.MCn, NR + 1), np.float32)
        s[np.arange(b.nb * b.MCn), b.row_chunk.reshape(-1)] = 1.0
        flag = (np.arange(b.KCn)[None, :]
                < b.mirror_kc[:, None]).astype(np.float32)
        out.append((g, s, flag))
    return out
