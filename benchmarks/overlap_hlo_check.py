#!/usr/bin/env python
"""Halo-exchange / compute overlap evidence (VERDICT r1 #4).

One real chip cannot run an 8-way mesh, so overlap cannot be profiled live
here.  This script produces the next-strongest artifact: it AOT-compiles
the distributed SpMV for a REAL 8-chip v5e topology
(jax.experimental.topologies, no hardware needed) and inspects the
scheduled HLO of the executable:

  - the x-halo ``ppermute`` lowers to async ``collective-permute-start`` /
    ``collective-permute-done`` pairs (ICI DMA runs in the background);
  - XLA's latency-hiding scheduler places compute between start and done
    -- the local block GEMMs execute while the halo is in flight, which is
    precisely the overlap the plan was designed for (SURVEY.md §5,
    parallel/distributed.py step 2).

The operator is constructed on a CPU mesh (data placement needs real
devices), then re-bound to the abstract TPU mesh through its pytree meta
-- the compiled program is identical to what an 8-chip pod slice would run.

Run: python benchmarks/overlap_hlo_check.py   (CPU only, ~1 min)
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import dataclasses

import numpy as np


def build_operator():
    import jax
    import blocksparse_tpu as bst
    from jax.sharding import Mesh
    from blocksparse_tpu.parallel.distributed import distribute

    rng = np.random.default_rng(0)
    n, group = 4096, 256
    blocks, rows, cols = [], [], []
    for g in range(n // group):
        r0 = g * group
        blocks.append(rng.standard_normal((group, group)).astype(np.float32))
        rows.append(np.arange(r0, r0 + group))
        cols.append(np.arange(r0, r0 + group))
        if g:  # chain coupling: every shard boundary is crossed
            blocks.append(
                rng.standard_normal((group, group)).astype(np.float32))
            rows.append(np.arange(r0, r0 + group))
            cols.append(np.arange(r0 - group, r0))
    A = bst.BlockSparseMatrix(blocks, rows, cols, (n, n), backend="xla")
    cpu_mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    return distribute(A, cpu_mesh), n


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from blocksparse_tpu.parallel.distributed import DistributedBlockOperator

    D, n = build_operator()
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    tpu_mesh = Mesh(np.array(topo.devices).reshape(8), ("rows",))
    meta2 = dataclasses.replace(D._meta, mesh=tpu_mesh)
    shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), D._arrays)
    Dabs = DistributedBlockOperator.tree_unflatten(meta2, (shapes,))

    x = jax.ShapeDtypeStruct((n,), jnp.float32)
    compiled = jax.jit(lambda D_, v: D_ @ v).lower(Dabs, x).compile()
    lines = compiled.as_text().splitlines()

    starts = [i for i, l in enumerate(lines)
              if "collective-permute-start" in l]
    dones = [i for i, l in enumerate(lines) if "collective-permute-done" in l]
    print(f"async collective-permute pairs: {len(starts)} start / "
          f"{len(dones)} done")
    assert starts and dones, "no async collectives found"

    heavy = re.compile(r"= f32\[\d+,\d+.*(fusion|dot|convolution)\(")
    total_windows = 0
    total_compute = 0
    gemm_hits = 0
    for s in starts:
        d = min((j for j in dones if j > s), default=None)
        if d is None:
            continue
        window = lines[s + 1:d]
        comp = [l for l in window if ("fusion(" in l or " dot(" in l)]
        gemms = [l for l in window if heavy.search(l)]
        total_windows += 1
        total_compute += len(comp)
        gemm_hits += len(gemms)
        print(f"  window {s}->{d}: {d - s - 1} scheduled ops, "
              f"{len(comp)} compute, {len(gemms)} f32 fusions/dots")
        for l in gemms[:3]:
            print("     ", l.strip()[:100])
    print(f"TOTAL: {total_compute} compute ops scheduled inside "
          f"{total_windows} in-flight collective windows "
          f"({gemm_hits} f32 fusions/dots)")
    ok = total_compute > 0
    print("OVERLAP:", "confirmed (latency-hiding scheduler interleaves "
          "compute with the halo exchange)" if ok else "NOT FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
