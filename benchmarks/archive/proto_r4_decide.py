"""Round-4 probe: default-choice measurements under the HONEST piped mode
(4 distinct same-structure operands -- bench.py round-4 methodology).

  M1 config1: multi-bucket minimal-op chain vs legacy per-bucket loop
     (BST_MULTI=never), piped-distinct + dep.
  M2 config2: the new auto panel choice (mirror penalty 1.9 ->
     expanded), piped-distinct + dep + engine/ratio label.
  M3 config4: patch SpMM canvas/G candidates, piped-distinct.

Run: python benchmarks/proto_r4_decide.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               "..", ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9
PIPE = 4


def modes(apply_fns, x, roof, name, iters=(5, 30)):
    ap = apply_fns[0]
    st = chained_time_per_iter(lambda v: ap(v) * 1e-3, x,
                               iters_lo=iters[0], iters_hi=iters[1],
                               repeats=5, reduce="stats")
    us = st["median"] * 1e6
    n = x.shape[0]
    rng = np.random.default_rng(11)
    Xp = jnp.asarray(rng.standard_normal((n, PIPE)).astype(np.float32))

    def piped(Xc):
        cols = [apply_fns[i % len(apply_fns)](Xc[:, i])
                for i in range(PIPE)]
        return jnp.stack(cols, axis=1) * 1e-3

    sp = chained_time_per_iter(piped, Xp, iters_lo=3, iters_hi=15,
                               repeats=5, reduce="stats")
    pus = sp["median"] * 1e6 / PIPE
    print(f"  [{name:16s}] dep {us:5.1f} us ({100*roof/us:5.1f}%) | "
          f"piped-distinct {pus:5.1f} us ({100*roof/pus:5.1f}%)",
          flush=True)


def main():
    sys.path.insert(0, os.path.dirname(__file__) + "/..")
    import bench

    rng = np.random.default_rng(0)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "m1"):
        As = [bench.build_config1()] + [
            bench.build_config1(value_seed=100 + i) for i in range(1, PIPE)]
        n = As[0].shape[0]
        roof = (As[0].nnz * 4 + 2 * n * 4) / BW * 1e6
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        print("M1 config1 engines:", flush=True)
        modes([(lambda A: lambda v: A @ v)(A) for A in As], x, roof,
              "multi (auto)", iters=(10, 60))

    if which in ("all", "m2"):
        Ss = [bench.build_config2()] + [
            bench.build_config2(value_seed=200 + i) for i in range(1, PIPE)]
        S = Ss[0]
        n2 = S.shape[0]
        logical = (S._dlayout.nnz + S._olayout.nnz) * 4 + 2 * n2 * 4
        roof2 = logical / BW * 1e6
        x2 = jnp.asarray(rng.standard_normal(n2).astype(np.float32))
        ent = S._panel_for(False)
        if ent is not None:
            p = ent[0]
            print(f"M2 config2: panel mirror={p.mirror} "
                  f"stream/logical={(p.tile_bytes + p.aux_bytes)/logical:.2f}",
                  flush=True)
        modes([(lambda A: lambda v: A @ v)(A) for A in Ss], x2, roof2,
              "auto (r4 model)")

    if which in ("all", "m3"):
        from blocksparse_tpu.core.patch import build_patch_plan
        from blocksparse_tpu.ops.patch_engine import (patch_device_arrays,
                                                      patch_spmm)
        As = [bench.build_config1()] + [
            bench.build_config1(value_seed=100 + i) for i in range(1, PIPE)]
        n = As[0].shape[0]
        R = 128
        roofM = (As[0].nnz * 4 + 2 * n * R * 4) / BW * 1e6
        X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
        XpM = jnp.asarray(
            rng.standard_normal((n, R * PIPE)).astype(np.float32))
        print("M3 config4 canvases (piped-distinct):", flush=True)
        for canvas, G in (((64, 4), 16), ((64, 4), 40), ((64, 8), 8),
                          (None, None)):
            pds = []
            for A in As:
                plan = build_patch_plan(A._layout, force_canvas=canvas,
                                        force_G=G)
                pds.append((plan, patch_device_arrays(plan)))
            st = chained_time_per_iter(
                lambda V: patch_spmm(pds[0][0], pds[0][1], V) * 1e-3, X,
                iters_lo=5, iters_hi=25, repeats=5, reduce="stats")
            us = st["median"] * 1e6

            def pipedM(Xc):
                parts = [patch_spmm(pds[i][0], pds[i][1],
                                    Xc[:, i * R:(i + 1) * R])
                         for i in range(PIPE)]
                return jnp.concatenate(parts, axis=1) * 1e-3

            sp = chained_time_per_iter(pipedM, XpM, iters_lo=3, iters_hi=10,
                                       repeats=5, reduce="stats")
            pus = sp["median"] * 1e6 / PIPE
            b = pds[0][0].buckets[0]
            print(f"  canvas {canvas} G={b.G}: dep {us:.1f} us "
                  f"({100*roofM/us:.1f}%) | piped-distinct {pus:.1f} us "
                  f"({100*roofM/pus:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
