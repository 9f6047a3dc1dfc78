"""Device-side benchmark timing that survives the axon TPU relay.

``jax.block_until_ready`` does not reliably synchronize through the tunneled
TPU backend in this environment (measured: dense 8k matmuls "finish" at
30,000 TFLOP/s), and a host fetch costs ~1 s fixed round-trip latency.  The
reliable estimator chains K iterations *inside one jit* (lax.fori_loop with a
data dependency), forces a scalar fetch, and differences two chain lengths to
cancel the fixed fetch/launch cost:

    t_per_iter = (T(iters_hi) - T(iters_lo)) / (iters_hi - iters_lo)
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["chained_time_per_iter"]


def chained_time_per_iter(
    step_fn,
    x0,
    *,
    iters_lo: int = 8,
    iters_hi: int = 40,
    repeats: int = 3,
    reduce: str = "median",
):
    """Per-iteration device time of ``x -> step_fn(x)``.

    ``step_fn`` must map an array (or pytree) to an array of the same
    structure so iterations chain.  Returns seconds per iteration.

    ``reduce``: "median" for a typical-load estimate, or "min" for the
    least-contended window — the pooled TPU behind the relay is shared, so
    its throughput varies several-fold over minutes; "min" approximates the
    uncontended capability (use for roofline comparisons).
    """

    @partial(jax.jit, static_argnums=1)
    def chain(x, iters):
        def body(i, v):
            return step_fn(v)

        out = jax.lax.fori_loop(0, iters, body, x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(jnp.real(leaf).astype(jnp.float32) * 0.0) + jnp.real(
            leaf
        ).astype(jnp.float32).ravel()[0]

    # compile + warm both variants
    float(chain(x0, iters_lo))
    float(chain(x0, iters_hi))

    estimates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chain(x0, iters_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(x0, iters_hi))
        t_hi = time.perf_counter() - t0
        estimates.append((t_hi - t_lo) / (iters_hi - iters_lo))
    estimates.sort()
    if reduce == "min":
        # smallest non-degenerate estimate (variance can drive the
        # difference quotient to ~0; require at least 1 us/iter)
        for e in estimates:
            if e > 1e-6:
                return e
        return max(estimates[-1], 1e-12)
    return max(estimates[len(estimates) // 2], 1e-12)
