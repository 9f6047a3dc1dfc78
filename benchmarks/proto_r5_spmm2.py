"""Round-5 probe 2: config4 SpMM -- canvas size x G, even-step effect.

proto_r5_spmm found (a) dep time is strongly better at EVEN grid-step
counts (4 steps: 11.6 us vs 5 steps: 16.3 us -- double-buffer parity),
(b) piped is stuck at ~17 us on the KCc=4 (KP=128) plan with ~120 slots,
suggesting per-slot overhead (~35 ns x slots) dominates piped.  This
probe sweeps canvas KCc in {4, 8, 16} (fewer, fatter slots) x G with
even and odd step counts, measuring piped + dep at HIGHEST.

Run on the TPU: python benchmarks/proto_r5_spmm2.py
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

from blocksparse_tpu.core.patch import build_patch_plan  # noqa: E402
from blocksparse_tpu.ops.patch_engine import (  # noqa: E402
    patch_device_arrays, patch_spmm)
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9
R = 128
PIPE = 4


def measure(apply_fn, n, label, roof_us):
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    dep = chained_time_per_iter(
        lambda V: apply_fn(0, V) * 1e-3, X, iters_lo=5, iters_hi=25,
        repeats=5, reduce="stats")
    Xp = jnp.asarray(rng.standard_normal((n, R * PIPE)).astype(np.float32))

    def piped(Xc):
        parts = [apply_fn(i, Xc[:, i * R:(i + 1) * R]) for i in range(PIPE)]
        return jnp.concatenate(parts, axis=1) * 1e-3

    pip = chained_time_per_iter(piped, Xp, iters_lo=3, iters_hi=10,
                                repeats=5, reduce="stats")
    d, p = dep["median"] * 1e6, pip["median"] * 1e6 / PIPE
    print(f"  [{label}] piped {p:.1f} us ({100*roof_us/p:.0f}%) | "
          f"dep {d:.1f} us ({100*roof_us/d:.0f}%)", flush=True)


def main():
    import bench

    A = bench.build_config1()
    As = [A] + [bench.build_config1(value_seed=100 + i)
                for i in range(1, PIPE)]
    layout = A._layout
    n = A.shape[0]
    roof_us = (A.nnz * 4 + 2 * n * R * 4) / BW * 1e6
    print(f"config4: roofline {roof_us:.1f} us", flush=True)

    rng = np.random.default_rng(1)
    Xo = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    Yo = np.asarray(A @ Xo)

    # default plan for reference geometry
    p0 = build_patch_plan(layout)
    b0 = p0.buckets[0]
    print(f"default plan: MP={b0.MP} KP={b0.KP} G={b0.G} nb={b0.nb} "
          f"steps={b0.nb//b0.G} padded={p0.value_bytes/1e6:.1f} MB",
          flush=True)

    for KCc in (4, 8, 16):
        for G in (8, 16, 24, 32, 64):
            try:
                plan = build_patch_plan(layout, force_canvas=(64, KCc),
                                        force_G=G)
            except ValueError as e:
                print(f"  [KCc={KCc} G={G}] rejected: {e}", flush=True)
                continue
            if plan is None:
                continue
            b = plan.buckets[0]
            if b.nb // b.G > 20:
                continue
            devs = [patch_device_arrays(
                build_patch_plan(Ai._layout, force_canvas=(64, KCc),
                                 force_G=G)) for Ai in As]
            plan_i = plan

            def apply_fn(i, X, plan_i=plan_i, devs=devs):
                return patch_spmm(plan_i, devs[i], X, precision="highest")

            out = np.asarray(apply_fn(0, Xo))
            err = np.max(np.abs(out - Yo)) / max(1.0, np.max(np.abs(Yo)))
            assert err < 1e-5, err
            measure(apply_fn, n,
                    f"KCc={KCc} G={b.G} steps={b.nb//b.G} nb={b.nb} "
                    f"MB={plan.value_bytes/1e6:.1f}", roof_us)


if __name__ == "__main__":
    main()
