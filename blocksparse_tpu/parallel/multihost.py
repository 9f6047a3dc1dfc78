"""Multi-host initialization helpers.

The distributed layer (distributed.py) is mesh-agnostic: it works the same
over a single-host multi-chip mesh, a multi-host pod slice, or a virtual CPU
mesh.  This module provides the thin glue for the multi-host case: call
:func:`init` once per process before building meshes; collectives between
shards on the same host ride ICI, cross-host edges of the same mesh axis ride
DCN -- XLA picks per edge, no code changes needed.
"""

from __future__ import annotations

import numpy as np

__all__ = ["init", "global_row_mesh"]


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host run.

    On TPU pods all arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU clusters.  Safe to call once per process;
    raises if called twice.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_row_mesh(axis: str = "rows"):
    """1-D mesh over every addressable device in the job (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
