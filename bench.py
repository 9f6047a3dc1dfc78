#!/usr/bin/env python
"""Benchmark driver: block-sparse SpMV/SpMM throughput vs roofline.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json config 1): general block-sparse SpMV,
4096x4096, ~200 uniform 64x64 fp32 dense blocks.  SpMV is HBM-bound, so the
roofline is memory bandwidth over bytes-per-nnz; ``vs_baseline`` is the
achieved fraction of roofline divided by the 0.80 north-star target
(>= 1.0 means the target is met).  Secondary configs print to stderr.

The reference publishes no numbers (BASELINE.md), so roofline fraction is the
baseline by definition.
"""

import json
import sys
import time

import numpy as np

# TPU v5e (the benchmark chip, tunneled via axon): HBM bandwidth ~819 GB/s.
HBM_GBPS = {"v5e": 819.0, "v5": 819.0, "v4": 1228.0, "v6e": 1640.0}
TARGET_FRACTION = 0.80  # BASELINE.json north star: >=80% of roofline


def detect_bw():
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    for k, v in HBM_GBPS.items():
        if gen.startswith(k):
            return v
    return 819.0


def build_config1(n=4096, nblocks=200, bs=64, seed=7, dtype=np.float32):
    """~200 uniform bs x bs blocks at block-aligned positions (config 1)."""
    import blocksparse_tpu as bst

    rng = np.random.default_rng(seed)
    ntiles = n // bs
    # distinct (row, col) tile positions
    pos = rng.choice(ntiles * ntiles, size=nblocks, replace=False)
    rows = (pos // ntiles) * bs
    cols = (pos % ntiles) * bs
    blocks = [rng.standard_normal((bs, bs)).astype(dtype) for _ in range(nblocks)]
    A = bst.BlockSparseMatrix(
        blocks,
        [np.arange(r, r + bs) for r in rows],
        [np.arange(c, c + bs) for c in cols],
        (n, n),
        backend="auto",
    )
    return A


def main():
    import jax
    import jax.numpy as jnp

    import blocksparse_tpu as bst
    from blocksparse_tpu.utils.timing import chained_time_per_iter

    backend = jax.default_backend()
    print(f"# backend: {backend}, devices: {jax.devices()}", file=sys.stderr)

    A = build_config1()
    n = A.shape[0]
    nnz = A.nnz
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))

    # chained on-device timing (block_until_ready is unreliable through the
    # axon relay; see blocksparse_tpu/utils/timing.py)
    dt = chained_time_per_iter(
        lambda v: (A @ v) * 1e-3, x, iters_lo=10, iters_hi=60, repeats=3
    )
    nnz_per_s = nnz / dt
    gflops = 2 * nnz / dt / 1e9

    # memory-bound roofline: each nnz read once (4 B fp32); x/y traffic is
    # negligible at this density but included for honesty
    bw = detect_bw() * 1e9
    bytes_per_matvec = nnz * 4 + 2 * n * 4
    roofline_nnz_per_s = nnz / (bytes_per_matvec / bw)
    frac = nnz_per_s / roofline_nnz_per_s

    print(
        f"# spmv 4096/200x64x64 f32: {dt*1e6:.1f} us, {gflops:.1f} GFLOP/s, "
        f"{nnz_per_s/1e9:.2f} Gnnz/s, {100*frac:.1f}% of roofline",
        file=sys.stderr,
    )

    # secondary: SpMM with 128 RHS columns (config 4)
    try:
        X = jnp.asarray(
            np.random.default_rng(1).standard_normal((n, 128)).astype(np.float32)
        )
        dtm = chained_time_per_iter(
            lambda v: (A @ v) * 1e-3, X, iters_lo=5, iters_hi=25, repeats=2
        )
        gflops_mm = 2 * nnz * 128 / dtm / 1e9
        print(
            f"# spmm r=128: {dtm*1e6:.1f} us, {gflops_mm:.1f} GFLOP/s",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover
        print(f"# spmm failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "block_spmv_4096_200x64x64_f32_roofline_fraction",
                "value": round(frac, 4),
                "unit": "fraction_of_hbm_roofline",
                "vs_baseline": round(frac / TARGET_FRACTION, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
