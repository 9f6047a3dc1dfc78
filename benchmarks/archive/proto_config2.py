"""Config-2 (symmetric SpMV) breakdown: where do the microseconds go?

python -u benchmarks/proto_config2.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402
from blocksparse_tpu.ops.dispatch import _xla_engine, apply_operand  # noqa: E402

BW = 819e9


def t(fn, x0):
    return chained_time_per_iter(fn, x0, iters_lo=10, iters_hi=60, repeats=5,
                                 reduce="min")


def main():
    print("devices:", jax.devices())
    S = bench.build_config2()
    n = S.shape[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    d_bytes = S._dlayout.padded_nnz * 4
    o_bytes = S._olayout.padded_nnz * 4
    print(f"diag {d_bytes/1e6:.1f} MB / {len(S._dlayout.buckets)} buckets; "
          f"offdiag {o_bytes/1e6:.1f} MB / {len(S._olayout.buckets)} buckets")

    # full product
    dt = t(lambda v: (S @ v) * 1e-3, x)
    sb = d_bytes + o_bytes
    print(f"full symmetric: {dt*1e6:.1f} us -> {100*(sb/BW)/dt:.1f}% stored-roofline")

    # diagonal-only
    def diag_only(v):
        y = apply_operand(S._dbuckets, S._dlayout, "xla", n, v,
                          precision=S._precision)
        return y * 1e-3 + v * 0.5
    print(f"diag only: {t(diag_only, x)*1e6:.1f} us "
          f"(roofline {d_bytes/BW*1e6:.1f} us)")

    # off-diagonal fused only
    def off_only(v):
        y = _xla_engine(S._obuckets, S._olayout.buckets, n, v,
                        transpose=False, conj=False, precision=S._precision,
                        scatter="atomic", symmetric=True)
        return y * 1e-3 + v * 0.5
    print(f"offdiag fused: {t(off_only, x)*1e6:.1f} us "
          f"(roofline {o_bytes/BW*1e6:.1f} us)")

    # off-diagonal forward-only (no mirror): launch-overhead probe
    def off_fwd(v):
        y = _xla_engine(S._obuckets, S._olayout.buckets, n, v,
                        transpose=False, conj=False, precision=S._precision,
                        scatter="atomic", symmetric=False)
        return y * 1e-3 + v * 0.5
    print(f"offdiag fwd-only: {t(off_fwd, x)*1e6:.1f} us")


if __name__ == "__main__":
    main()
