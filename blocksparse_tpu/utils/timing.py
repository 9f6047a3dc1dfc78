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

    ``reduce``: "median" for a typical-load estimate, "min" for the
    least-contended window — the pooled TPU behind the relay is shared, so
    its throughput varies several-fold over minutes; "min" approximates the
    uncontended capability (use for roofline comparisons).  "stats" returns
    a dict {min, median, max, n} over the repeats so benchmark artifacts
    record the spread, not a single point (a degenerate measurement is then
    visible instead of masquerading as a fast one).
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

    def measure(lo, hi, reps):
        # compile + warm both variants
        float(chain(x0, lo))
        float(chain(x0, hi))
        est = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x0, lo))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chain(x0, hi))
            t_hi = time.perf_counter() - t0
            est.append((t_hi - t_lo) / (hi - lo))
        return est

    estimates = measure(iters_lo, iters_hi, repeats)
    # Resolution guard: the fetch round trip jitters by tens of ms, so the
    # measured window (hi - lo) * dt must be much larger or the difference
    # quotient is noise.  Scale the chain lengths up until it is.
    TARGET_WINDOW = 0.5  # seconds
    for _ in range(4):
        mid = sorted(estimates)[len(estimates) // 2]
        span = max(mid, 0.0) * (iters_hi - iters_lo)
        if span >= TARGET_WINDOW / 4 or iters_hi >= 20000:
            break
        scale = int(min(
            max(2, TARGET_WINDOW / max(span, 1e-4)),
            20000 / iters_hi,
        ))
        if scale < 2:
            break
        iters_lo *= scale
        iters_hi *= scale
        estimates = measure(iters_lo, iters_hi, repeats)

    estimates.sort()
    if reduce == "stats":
        valid = [e for e in estimates if e > 1e-6] or [max(estimates[-1], 1e-12)]
        return {
            "min": valid[0],
            "median": valid[len(valid) // 2],
            "max": valid[-1],
            "n": len(valid),
        }
    if reduce == "min":
        # smallest non-degenerate estimate (variance can drive the
        # difference quotient to ~0; require at least 1 us/iter)
        for e in estimates:
            if e > 1e-6:
                return e
        return max(estimates[-1], 1e-12)
    return max(estimates[len(estimates) // 2], 1e-12)
