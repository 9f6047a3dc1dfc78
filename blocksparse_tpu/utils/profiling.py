"""Profiling hooks: jax.profiler traces around block-sparse products.

The reference has no tracing/profiling at all (SURVEY.md §5); these helpers
make kernel inspection first-class: wrap any region in :func:`trace` and load
the resulting directory in TensorBoard / xprof to see per-op device timings,
or use :func:`annotate` to label custom regions inside jitted code.
"""

from __future__ import annotations

import contextlib

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False):
    """Capture a device trace of the enclosed block.

    Example::

        with trace("/tmp/bsp-trace"):
            y = (A @ x).block_until_ready()
    """
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation usable inside and outside jit.

    Example::

        with annotate("spmv-halo-exchange"):
            ...
    """
    import jax

    return jax.profiler.TraceAnnotation(name)
