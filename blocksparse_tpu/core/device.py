"""Host->device staging for packed bucket data.

One rule lives here: **complex bucket values never get device_put on a TPU
backend.**  The tunneled TPU runtime used for on-chip testing cannot
device_put complex arrays -- the put itself reports success (async dispatch)
but wedges the runtime, and every later transfer in the process fails with
``UNIMPLEMENTED: TPU backend error``.  Complex products on TPU are served by
the split-real engines instead (``LinearOperator._complex_split_route`` ->
``complexops.ComplexSplitOperator``), which rebuild two real operators from
the host-side layout copy -- so the device copy of the complex values would
never be read anyway.

Reference parity note: the reference's primary workload is ComplexF64 BEM
matrices (/root/reference/test/test_symmetricblockmatrix.jl:68-98); on TPU
that workload runs as four real products per complex product
(SURVEY.md section 7, design stance 8).

Set ``BST_COMPLEX_DEVICE=1`` to force device staging of complex values on
TPU deployments whose runtime does support complex transfers.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stage_buckets", "complex_stays_on_host", "trace_clean",
           "plan_cache_entry"]


def trace_clean() -> bool:
    """True outside any jit trace.  Device arrays built INSIDE a trace are
    trace-local tracers (omnistaging); caching one across traces raises
    UnexpectedTracerError on the next jit."""
    try:
        return jax.core.trace_state_clean()
    except AttributeError:  # pragma: no cover - older jax
        return False


def plan_cache_entry(cache: dict, key, build_plan, build_dev):
    """(plan, device_leaves) for a lazy per-instance plan cache, or None.

    The host-side PLAN (numpy) caches unconditionally; the DEVICE leaves
    cache only when built outside a jit trace -- inside a trace they are
    rebuilt per trace (cheap: jnp.asarray of host arrays, deduplicated by
    the jit constant pool).  This is what makes ``jit(lambda x: A @ x)``
    safe as an operator's FIRST product (previously the traced device
    leaves leaked into later traces)."""
    ent = cache.get(key)
    if ent is None:
        plan = build_plan()
        ent = {"plan": plan, "dev": None}
        cache[key] = ent
    if ent["plan"] is None:
        return None
    if ent["dev"] is not None:
        return (ent["plan"], ent["dev"])
    dev = build_dev(ent["plan"])
    if trace_clean():
        ent["dev"] = dev
    return (ent["plan"], dev)


def complex_stays_on_host(dtype) -> bool:
    """True when arrays of ``dtype`` must not be transferred to the device."""
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        return False
    if os.environ.get("BST_COMPLEX_DEVICE", "0") == "1":
        return False
    return jax.default_backend() == "tpu"


def stage_buckets(buckets):
    """Device (values, row_idx, col_idx) triples for a layout's buckets.

    Complex values stay as host numpy arrays on TPU (see module docstring);
    index tables are always int32 and always staged.
    """
    out = []
    for b in buckets:
        if complex_stays_on_host(b.values.dtype):
            vals = np.asarray(b.values)
        else:
            vals = jnp.asarray(b.values)
        out.append((vals, jnp.asarray(b.row_idx), jnp.asarray(b.col_idx)))
    return tuple(out)
