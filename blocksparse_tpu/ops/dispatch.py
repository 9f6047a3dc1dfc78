"""Backend dispatch: route each bucket to the best compute engine.

Per-bucket static decision (made at trace time from host-side layout
metadata, so it is part of the jit cache key via the operator's aux data):

  - ``pallas``  : fused contiguous-range kernel (ops/pallas/fused_spmm.py)
                  when the bucket's ranges are contiguous, the dtype is real,
                  and the x/y panels fit VMEM;
  - ``xla``     : the general gather/einsum/scatter engine (ops/xla_spmv.py)
                  for scattered indices, complex dtypes, or oversized panels.

Backend strings carried by operators:
  "auto"             -- pallas on TPU where eligible, else XLA
  "xla"              -- always the XLA engine
  "pallas"           -- force the pallas kernel for eligible buckets
  "pallas-interpret" -- pallas in interpreter mode (CPU testing of the
                        kernel's logic; used by the test suite)
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pallas.fused_spmm import choose_config, chunked_block_apply
from .xla_spmv import bucket_apply, chunked_bucket_apply, chunked_multi_apply

# -- strip/slab routing (round 2) -------------------------------------------
# Launch-overhead proxy: one XLA bucket launch costs roughly the time of
# streaming this many bytes (measured ~2.6us/bucket on the v5e = ~2 MB; a
# conservative 1 MB biases toward the proven engine).  Overridable per
# deployment: BST_STRIP=never|always|auto, BST_STRIP_TAX_MB=<float>.
_STRIP_TAX = float(os.environ.get("BST_STRIP_TAX_MB", "1.0")) * 1e6


def strip_mode() -> str:
    return os.environ.get("BST_STRIP", "auto")


# -- auto backend policy (VERDICT r1 #10: measured, logged, overridable) -----
_MEASURED_DEFAULT = {"spmv": "xla", "spmm": "pallas"}
_policy_logged: set = set()

# per-population measured winners (VERDICT r2 weak #8): keyed by
# (layout hash, kind) so a deployment mixing scattered and uniform
# operators routes each population to its own autotuned engine.
# Written by utils/autotune.autotune_backend(set_policy=True).
_POPULATION_POLICY: dict = {}


def set_population_policy(layout, kind: str, winner: str) -> None:
    _POPULATION_POLICY[(hash(layout), kind)] = winner


def auto_policy(kind: str, layout=None) -> str:
    """Engine for backend="auto": 'xla' or 'pallas'.

    Resolution order:
      1. per-population measured winner for this operator's layout
         (utils/autotune.autotune_backend stores it keyed by layout hash);
      2. env override  BST_AUTO_SPMV / BST_AUTO_SPMM = xla|pallas
         (set manually; process-wide);
      3. measured default for the v5e this repo was tuned on
         (docs/performance.md: SpMV chunked-XLA 622 vs ~450 GB/s;
         SpMM fused-Pallas 29.4 vs 10.7 TFLOP/s at r=128).

    BST_LOG_DISPATCH=1 logs each (kind, policy, source) decision once.
    """
    pop = (
        _POPULATION_POLICY.get((hash(layout), kind))
        if layout is not None else None
    )
    env = os.environ.get(f"BST_AUTO_{kind.upper()}")
    if env is not None and env not in ("xla", "pallas"):
        import warnings

        warnings.warn(
            f"BST_AUTO_{kind.upper()}={env!r} is not one of 'xla'/'pallas';"
            " ignoring the override and using the measured default"
        )
        env = None
    if pop is not None:
        policy, src = pop, "autotune(population)"
    elif env in ("xla", "pallas"):
        policy, src = env, "env"
    else:
        policy, src = _MEASURED_DEFAULT[kind], "measured default"
    if os.environ.get("BST_LOG_DISPATCH") and (kind, policy) not in _policy_logged:
        import sys

        _policy_logged.add((kind, policy))
        print(f"[bst dispatch] {kind}: {policy} ({src})", file=sys.stderr)
    return policy


def strip_eligible(backend: str, x, dtype) -> bool:
    """Static pre-check for the slab kernel path (r=1, f32, TPU/interpret)."""
    if strip_mode() == "never" or backend == "xla":
        return False
    if x.ndim != 1:
        return False
    if jnp.dtype(dtype) != jnp.float32 or x.dtype != jnp.float32:
        return False
    if backend != "pallas-interpret" and jax.default_backend() != "tpu":
        return False
    return True


def strip_wins(plan, layouts_reads) -> bool:
    """Host-side cost model: slab stream vs per-bucket XLA launches.

    ``layouts_reads``: [(layout, n_value_reads)] -- symmetric off-diagonals
    count 2 reads on the XLA path (measured: XLA does not fuse the two
    einsums into one traversal) but 1 on the fused slab pass.
    """
    if plan is None:
        return False
    if strip_mode() == "always":
        return True

    def idx_tax(lay):
        # cover-scattered buckets pay XLA's measured ~7 ns/random-chunk-index
        # gather/scatter cost (= ~5.5 KB of streaming each,
        # benchmarks/archive/proto_cover.py); contiguous buckets' few post-merge
        # indices are already covered by the byte model
        return sum(
            5500 * b.nblocks * (b.mp // b.chunk + b.kp // b.chunk)
            for b in lay.buckets
            if b.chunk > 1 and not b.all_contiguous
        )

    xla = sum(
        l.padded_nnz * 4 * rd + _STRIP_TAX * max(len(l.buckets), 1)
        + idx_tax(l) * rd
        for l, rd in layouts_reads
    )
    strip = plan.tile_bytes + plan.aux_bytes + _STRIP_TAX
    return strip < xla


# -- panel routing (round 3) --------------------------------------------------
# K-merged panel plans (core/panel.py) + panel kernel (ops/pallas/
# panel_spmv.py): the padding-exact evolution of the slab stream.  Routing
# picks the cheapest byte stream among panel / slab / per-bucket XLA.


def panel_mode() -> str:
    return os.environ.get("BST_PANEL", "auto")


def stream_plan_choice(pentry, sentry, layouts_reads) -> str | None:
    """'panel' | 'strip' | None: cheapest total HBM stream wins.

    ``pentry``/``sentry``: (plan, device_leaves) or None.  The XLA
    alternative is costed exactly as in :func:`strip_wins` (padded reads,
    per-bucket launch tax, scattered-index tax).
    """
    mode = panel_mode()
    if mode == "always" and pentry is not None:
        return "panel"
    cands = []
    if pentry is not None and mode != "never":
        cands.append((pentry[0].tile_bytes + pentry[0].aux_bytes
                      + _STRIP_TAX, "panel"))
    if sentry is not None and strip_mode() != "never":
        cands.append((sentry[0].tile_bytes + sentry[0].aux_bytes
                      + _STRIP_TAX, "strip"))
    if strip_mode() == "always" and sentry is not None:
        return "strip"
    if not cands:
        return None

    def bucket_cost(b):
        # Scattered buckets pay gather/scatter machinery scaling with the
        # chunk granularity.  Measured v5e anchors: chunk-64 k-merge
        # concatenations run at ~1.05x their padded bytes (config1's 93.5%
        # headline goes through them), chunk-4 cover buckets at ~2x
        # (configS element path: 112 us = 92 MB-equivalent on 47 MB
        # padded), element (chunk-1) mask-select at ~3x.  No launch taxes
        # on the XLA side: pipelined use hides them, and omitting them
        # biases toward the proven bucket engines.
        pb = b.nblocks * b.mp * b.kp * 4
        return pb if b.all_contiguous else pb * min(3.0, 1.0 + 4.0 / b.chunk)

    xla = sum(
        sum(bucket_cost(b) for b in l.buckets) * rd
        for l, rd in layouts_reads
    )
    bytes_, which = min(cands)
    return which if bytes_ - _STRIP_TAX < xla else None


# -- patch routing (round 3) --------------------------------------------------
# The merged-patch layout (core/patch.py) + mono-kernels (ops/patch_engine
# .py): chunk-exact canvases for contiguous-range populations.  One value
# read per product even for symmetric operands; single launch.


def patch_mode() -> str:
    return os.environ.get("BST_PATCH", "auto")


def patch_eligible(backend: str, x, dtype) -> bool:
    """Static pre-check for the patch engines (f32, TPU/interpret, any r)."""
    if patch_mode() == "never" or backend == "xla":
        return False
    if jnp.dtype(dtype) != jnp.float32 or x.dtype != jnp.float32:
        return False
    if backend != "pallas-interpret" and jax.default_backend() != "tpu":
        return False
    return True


def patch_wins(plan, layouts_reads, r: int = 1) -> bool:
    """Host-side cost model: patch mono-kernel vs the bucket engines.

    r == 1: byte model -- one value-stream read + streamed one-hot aux vs
    the bucket path's padded reads (2x per stored symmetric off-diagonal)
    and per-bucket launch tax.

    r > 1: the patch SpMM kernel keeps x/y VMEM-resident with one MXU dot
    per slot; measured 75% of HBM roofline where the per-bucket fused
    engine reached 30% on the same population (benchmarks/archive/proto_r3_oh.py),
    and the bucket engines re-stream values per 128-column RHS slice.
    Patch wins whenever its padded bytes do not exceed the bucket path's
    single-read bytes by more than the measured throughput advantage (2x).
    """
    if plan is None:
        return False
    if patch_mode() == "always":
        return True

    if r > 1:
        # two distinct slice widths meet here (ADVICE r3: keep them
        # visibly distinct): the bucket engines re-stream values per
        # 128-column RHS slice (this module's R_SLICE), the patch
        # mono-kernel per 256 columns (patch_engine.R_SLICE)
        from .patch_engine import R_SLICE as _PATCH_R_SLICE

        _BUCKET_R_SLICE = R_SLICE
        bucket_slices = -(-r // _BUCKET_R_SLICE)
        bucket = sum(
            l.padded_nnz * 4 * rd * bucket_slices
            + _STRIP_TAX * max(len(l.buckets), 1) * bucket_slices
            for l, rd in layouts_reads
        )
        return plan.value_bytes * -(-r // _PATCH_R_SLICE) < 2 * bucket
    # r == 1: the current mono-kernel is VPU-reduction-bound (~35-50% of
    # wire measured, benchmarks/archive/proto_r3_k1b.py) and loses to the chunked
    # einsum engine (~75%) on every BASELINE population -- keep it opt-in
    # (BST_PATCH=always) until a kernel variant actually wins.
    return False


def _mask_gs_mode(backend: str) -> str | None:
    """Mask-select gather/scatter routing for the element engine
    (ops/pallas/mask_select.py).  BST_MASK_GS=never disables; backend
    "xla" stays pure XLA (the reference path the tests compare against)."""
    if os.environ.get("BST_MASK_GS", "auto") == "never" or backend == "xla":
        return None
    if backend == "pallas-interpret":
        return "interpret"
    return "compiled" if jax.default_backend() == "tpu" else None


def _xla_engine(dev_buckets, host_buckets, out_len, x, *, transpose, conj,
                precision, scatter, symmetric=False, mask_gs=None,
                layout=None, colors=None, bucket_ids=None):
    """Non-pallas path: chunk-granular engine for chunked buckets, element
    engine (optionally sorted-scatter) for the rest.

    ``symmetric=True`` emits each bucket's forward AND transposed
    contribution from one read of its values (the one-read fused pass).

    ``colors``: the operator's color sets (schedule="colored" only).  When
    profitable, the element buckets run the colored gather-round plan
    (ops/colored.py) instead of scatter-add -- the plan whose correctness
    *depends* on the coloring invariant (the serial/colored duality test is
    the reference's 1-vs-5-thread CI analog and can now actually fail)."""
    y = None
    # minimal-op composition over the chunked buckets (round 4): one
    # shared gather, per-bucket einsums, ONE one-hot scatter dot -- the
    # per-bucket loop serializes ~3 ops per bucket in a dependent chain
    # (bench config1 dep 7.1 -> 6.1 us, benchmarks/archive/proto_r4_dep3.py).
    multi_pos: list[int] = []
    if not symmetric and os.environ.get("BST_MULTI", "auto") != "never":
        by_chunk: dict[int, list[int]] = {}
        for pos, hb in enumerate(host_buckets):
            if hb.chunk > 1:
                by_chunk.setdefault(hb.chunk, []).append(pos)
        if by_chunk:
            cand = max(by_chunk.values(), key=len)
            # complex check over the CANDIDATE buckets only -- an unrelated
            # complex elem-granularity bucket must not disable the
            # minimal-op chain for the real chunked group
            dt = jnp.result_type(
                x.dtype, *[dev_buckets[p][0].dtype for p in cand]
            )
            C_ = host_buckets[cand[0]].chunk
            n_rows = sum(
                host_buckets[p].nblocks
                * ((host_buckets[p].kp if transpose
                    else host_buckets[p].mp) // C_)
                for p in cand)
            W_ = -(-out_len // C_)
            if (len(cand) >= 2
                    and not jnp.issubdtype(dt, jnp.complexfloating)
                    and W_ * n_rows * 2 <= 4 << 20):
                multi_pos = cand
    if multi_pos:
        part = chunked_multi_apply(
            [host_buckets[p] for p in multi_pos],
            [dev_buckets[p][0] for p in multi_pos],
            out_len, x, transpose=transpose, conj=conj,
            precision=precision,
        )
        y = part if y is None else y + part
    elem_dev, elem_host, elem_ids = [], [], []
    for pos, (hb, (vals, ridx, cidx)) in enumerate(
            zip(host_buckets, dev_buckets)):
        if pos in multi_pos:
            continue
        if hb.chunk > 1:
            rc = jnp.asarray(hb.row_chunk_idx)
            cc = jnp.asarray(hb.col_chunk_idx)
            part = chunked_bucket_apply(
                vals, rc, cc, hb.chunk, out_len, x,
                transpose=transpose, conj=conj, precision=precision,
                row_chunk_max=int(hb.row_chunk_idx.max()),
                col_chunk_max=int(hb.col_chunk_idx.max()),
                symmetric=symmetric,
            )
            y = part if y is None else y + part
        else:
            elem_dev.append((vals, ridx, cidx))
            elem_host.append(hb)
            if bucket_ids is not None:
                elem_ids.append(bucket_ids[pos])
    if elem_dev:
        cplan = None
        if (colors is not None and layout is not None and elem_ids
                and scatter != "sorted"):
            from .colored import build_colored_plan, colored_mode, colored_wins

            mode = colored_mode()
            n_entries = sum(
                hb.nblocks * (hb.mp + hb.kp if symmetric
                              else (hb.kp if transpose else hb.mp))
                for hb in elem_host
            )
            if mode == "always" or (
                mode == "auto"
                and colored_wins(len(colors), out_len, n_entries)
            ):
                cplan = build_colored_plan(
                    layout, colors, out_len, transpose, elem_ids,
                    symmetric=symmetric,
                )
        sinfo = (
            _sorted_scatter_info(elem_host, transpose)
            if scatter == "sorted" and not symmetric and cplan is None
            else None
        )
        part = bucket_apply(
            elem_dev, out_len, x, transpose=transpose, conj=conj,
            precision=precision, scatter_info=sinfo, symmetric=symmetric,
            mask_gs=mask_gs, colored_plan=cplan,
        )
        y = part if y is None else y + part
    return y


def _sorted_scatter_info(host_buckets, transpose: bool):
    """Host-side scatter permutations for the sort+segment-sum strategy."""
    import jax.numpy as jnp

    info = []
    for hb in host_buckets:
        targets = (hb.col_idx if transpose else hb.row_idx).reshape(-1)
        perm = np.argsort(targets, kind="stable")
        info.append(
            (jnp.asarray(perm.astype(np.int32)),
             jnp.asarray(targets[perm].astype(np.int32)))
        )
    return info

__all__ = ["apply_operand"]

_REAL_TPU_DTYPES = ("float32", "bfloat16")


R_SLICE = 128  # RHS columns per Pallas launch for wide SpMM


def _bucket_eligible(host_bucket, n_in, n_out, r, interpret: bool, dtype) -> bool:
    # the kernel is chunk-table driven: any chunked bucket qualifies
    # (contiguous ranges, k-merged concatenations, chunk-scattered alike);
    # chunk >= 8 = the f32 sublane granularity Mosaic dynamic slices need
    if host_bucket.chunk < 8:
        return False
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        return False
    if not interpret and np.dtype(dtype).name not in _REAL_TPU_DTYPES:
        return False
    # bf16 VMEM tiles are (16, 128): Mosaic requires provably-aligned
    # dynamic-slice starts, which the chunked layout guarantees only for
    # chunk >= 16
    if np.dtype(dtype).name == "bfloat16" and host_bucket.chunk < 16:
        return False
    # the kernel scalar-prefetches both chunk tables into SMEM (1 MB on
    # the v5e); a large population at fine chunk granularity overflows it
    # at COMPILE time (observed: 2000 blocks at chunk=8 -> 3.2 MB table
    # -> Mosaic "Allocation would exceed memory (space=smem)").  Guard
    # with headroom and fall back to the XLA engine.
    table_bytes = host_bucket.nblocks * 4 * (
        host_bucket.mp // host_bucket.chunk
        + host_bucket.kp // host_bucket.chunk)
    if table_bytes > 400_000:
        return False
    # wide RHS runs as R_SLICE-column launches (single-tile grids keep the
    # output panel single-buffered); eligibility checks one slice
    return (
        choose_config(
            n_in, n_out, host_bucket.mp, host_bucket.kp, min(r, R_SLICE),
            host_bucket.nblocks,
        )
        is not None
    )


def _pallas_apply_raw(vals, rc, cc, chunk, x, out_len, *, transpose=False,
                      symmetric=False, interpret=False, precision=None):
    """Launch the fused kernel, splitting wide RHS into R_SLICE columns."""
    r = 1 if x.ndim == 1 else x.shape[1]
    if r <= R_SLICE:
        return chunked_block_apply(
            vals, rc, cc, chunk, x, out_len, transpose=transpose,
            symmetric=symmetric, interpret=interpret, precision=precision,
        )
    parts = [
        chunked_block_apply(
            vals, rc, cc, chunk, x[:, lo : lo + R_SLICE], out_len,
            transpose=transpose, symmetric=symmetric, interpret=interpret,
            precision=precision,
        )
        for lo in range(0, r, R_SLICE)
    ]
    return jnp.concatenate(parts, axis=1)


def _gather_chunks(mat, chunk_idx, C):
    """Gather C-row chunks: [n(, r)] + [nb, e//C] -> [nb, e, r]."""
    m2 = mat[:, None] if mat.ndim == 1 else mat
    n, r = m2.shape
    pad = -n % C
    if pad:
        m2 = jnp.pad(m2, ((0, pad), (0, 0)))
    m2 = m2.reshape(-1, C, r)
    nb, ec = chunk_idx.shape
    return m2[chunk_idx].reshape(nb, ec * C, r)


def _float0_like(a):
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 5, 6, 7, 8, 9))
def _pallas_apply_vjp(vals, rc, cc, chunk, x, out_len, transpose, symmetric,
                      interpret, precision):
    return _pallas_apply_raw(vals, rc, cc, chunk, x, out_len,
                             transpose=transpose, symmetric=symmetric,
                             interpret=interpret, precision=precision)


def _pallas_vjp_fwd(vals, rc, cc, chunk, x, out_len, transpose, symmetric,
                    interpret, precision):
    y = _pallas_apply_raw(vals, rc, cc, chunk, x, out_len, transpose=transpose,
                          symmetric=symmetric, interpret=interpret,
                          precision=precision)
    return y, (vals, rc, cc, x)


def _pallas_vjp_bwd(chunk, out_len, transpose, symmetric, interpret, precision,
                    res, g):
    vals, rc, cc, x = res
    n_in = x.shape[0]
    statics = dict(interpret=interpret, precision=precision)
    if symmetric:
        dx = _pallas_apply_raw(vals, rc, cc, chunk, g, n_in, transpose=False,
                               symmetric=True, **statics)
        gr, xc = _gather_chunks(g, rc, chunk), _gather_chunks(x, cc, chunk)
        xr, gc = _gather_chunks(x, rc, chunk), _gather_chunks(g, cc, chunk)
        dvals = (jnp.einsum("bmr,bkr->bmk", gr, xc)
                 + jnp.einsum("bmr,bkr->bmk", xr, gc))
    else:
        dx = _pallas_apply_raw(vals, rc, cc, chunk, g, n_in,
                               transpose=not transpose, symmetric=False,
                               **statics)
        out_tab, in_tab = (cc, rc) if transpose else (rc, cc)
        go = _gather_chunks(g, out_tab, chunk)
        xi = _gather_chunks(x, in_tab, chunk)
        if transpose:
            dvals = jnp.einsum("bmr,bkr->bmk", xi, go)
        else:
            dvals = jnp.einsum("bmr,bkr->bmk", go, xi)
    return (dvals.astype(vals.dtype), _float0_like(rc), _float0_like(cc),
            dx.astype(x.dtype))


_pallas_apply_vjp.defvjp(_pallas_vjp_fwd, _pallas_vjp_bwd)


def _pallas_apply(vals, rc, cc, chunk, x, out_len, *, transpose=False,
                  symmetric=False, interpret=False, precision=None):
    """`_pallas_apply_raw` wrapped in a custom VJP (pallas_call has no AD
    rule, so without this `jax.grad` of an auto-dispatched TPU product fails;
    the cotangents are exact because the operator is linear)."""
    return _pallas_apply_vjp(vals, rc, cc, chunk, x, out_len, transpose,
                             symmetric, interpret, precision)


def apply_operand(
    dev_buckets,
    layout,
    backend: str,
    out_len: int,
    x,
    *,
    transpose: bool = False,
    conj: bool = False,
    precision=None,
    scatter: str = "atomic",
    colors=None,
):
    """Apply a bucketed operand with per-bucket backend routing.

    ``colors``: color sets (tuple of tuples of block ids) when the
    operator's schedule is "colored" -- enables the colored gather-round
    plan on the element engine (ops/colored.py)."""
    interpret = backend == "pallas-interpret"
    if backend == "xla":
        use_pallas = False
    elif backend in ("pallas", "pallas-interpret"):
        use_pallas = True
    else:  # auto: measured policy, env/autotune-overridable (auto_policy)
        r_ = 1 if x.ndim == 1 else x.shape[1]
        use_pallas = (
            jax.default_backend() == "tpu"
            and auto_policy("spmv" if r_ == 1 else "spmm", layout) == "pallas"
        )

    if not use_pallas:
        y = _xla_engine(
            dev_buckets, layout.buckets, out_len, x, transpose=transpose,
            conj=conj, precision=precision, scatter=scatter,
            mask_gs=_mask_gs_mode(backend), layout=layout, colors=colors,
            bucket_ids=tuple(range(len(layout.buckets))),
        )
        if y is None:
            shape = (out_len,) if x.ndim == 1 else (out_len, x.shape[1])
            y = jnp.zeros(shape, dtype=x.dtype)
        return y

    n_in = x.shape[0]
    r = 1 if x.ndim == 1 else x.shape[1]
    dtype = jnp.result_type(x.dtype, *[v.dtype for v, _, _ in dev_buckets])

    pallas_parts = []
    xla_buckets = []
    xla_hosts = []
    xla_ids = []
    for bid, (host_b, (vals, ridx, cidx)) in enumerate(
            zip(layout.buckets, dev_buckets)):
        if _bucket_eligible(host_b, n_in, out_len, r, interpret, dtype):
            rc = jnp.asarray(host_b.row_chunk_idx, dtype=jnp.int32)
            cc = jnp.asarray(host_b.col_chunk_idx, dtype=jnp.int32)
            pallas_parts.append((vals, rc, cc, host_b.chunk))
        else:
            xla_buckets.append((vals, ridx, cidx))
            xla_hosts.append(host_b)
            xla_ids.append(bid)
    # route non-pallas buckets through the chunk-aware engine

    y = None
    for vals, rc, cc, chunk in pallas_parts:
        # conj is a no-op for the real dtypes this path admits
        part = _pallas_apply(
            vals, rc, cc, chunk, x, out_len, transpose=transpose,
            interpret=interpret, precision=precision,
        )
        y = part if y is None else y + part
    if xla_buckets:
        part = _xla_engine(
            xla_buckets, xla_hosts, out_len, x, transpose=transpose,
            conj=conj, precision=precision, scatter=scatter,
            mask_gs=_mask_gs_mode(backend), layout=layout, colors=colors,
            bucket_ids=tuple(xla_ids),
        )
        y = part if y is None else y + part
    if y is None:
        shape = (out_len,) if x.ndim == 1 else (out_len, r)
        y = jnp.zeros(shape, dtype=dtype)
    return y


def apply_symmetric(
    diag_buckets,
    diag_layout,
    off_buckets,
    off_layout,
    backend: str,
    n: int,
    x,
    *,
    transpose: bool = False,
    conj: bool = False,
    precision=None,
    diag_colors=None,
    fused_colors=None,
):
    """Symmetric operand: S = D + O + O^T.

    The off-diagonal pair is transpose-invariant and, where eligible, runs
    through the *fused* Pallas pass (one HBM read per stored block feeding
    both MXU contributions -- the reference reads each block twice,
    symmetricblockmatrix.jl:394-418).  The diagonal pass honors both flags.
    """
    interpret = backend == "pallas-interpret"
    r = 1 if x.ndim == 1 else x.shape[1]
    if backend == "xla":
        use_pallas = False
    elif backend in ("pallas", "pallas-interpret"):
        use_pallas = True
    else:  # auto: measured policy (chunked XLA wins/ties the fused pass for
        # SpMV, 127 vs 187 us at 4k; fusion pays for SpMM), overridable via
        # env/autotune (auto_policy)
        use_pallas = (
            jax.default_backend() == "tpu"
            and auto_policy("spmv" if r == 1 else "spmm",
                            off_layout) == "pallas"
        )
    dtype = jnp.result_type(
        x.dtype, *[v.dtype for v, _, _ in diag_buckets + off_buckets]
    )

    y = None
    fused_ok = use_pallas and not np.issubdtype(np.dtype(dtype), np.complexfloating)
    xla_off = []
    xla_off_hosts = []
    xla_off_ids = []
    for obid, (host_b, (vals, ridx, cidx)) in enumerate(
            zip(off_layout.buckets, off_buckets)):
        if fused_ok and _bucket_eligible(host_b, x.shape[0], n, r, interpret, dtype):
            rc = jnp.asarray(host_b.row_chunk_idx, dtype=jnp.int32)
            cc = jnp.asarray(host_b.col_chunk_idx, dtype=jnp.int32)
            part = _pallas_apply(
                vals, rc, cc, host_b.chunk, x, n, symmetric=True,
                interpret=interpret, precision=precision,
            )
            y = part if y is None else y + part
        else:
            xla_off.append((vals, ridx, cidx))
            xla_off_hosts.append(host_b)
            xla_off_ids.append(obid)
    if xla_off:
        # One-read fused pass: both contributions per stored block from a
        # single values traversal (vs the reference's two passes,
        # symmetricblockmatrix.jl:394-418).  ``fused_colors`` (union-
        # conflict sets, fusedcolors()) let the element buckets run the
        # colored gather rounds for BOTH scatters (ops/colored.py).
        part = _xla_engine(
            xla_off, xla_off_hosts, n, x, transpose=False, conj=conj,
            precision=precision, scatter="atomic", symmetric=True,
            mask_gs=_mask_gs_mode(backend), layout=off_layout,
            colors=fused_colors, bucket_ids=tuple(xla_off_ids),
        )
        y = part if y is None else y + part

    diag = apply_operand(
        diag_buckets, diag_layout, backend, n, x, transpose=transpose,
        conj=conj, precision=precision, colors=diag_colors,
    )
    return diag if y is None else y + diag
