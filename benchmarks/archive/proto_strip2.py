"""Ablate the strip-engine graph: which op eats the time?

python -u benchmarks/proto_strip2.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.proto_strip import build_tiles, t, BW, RC, CC  # noqa: E402
from blocksparse_tpu.utils.testmatrices import random_symmetric  # noqa: E402


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    d, di, o, ri, ci, (n, _) = random_symmetric(
        8, n=4096, ngroups=48, noffdiag=160, dtype=np.float32, contiguous=True)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    ov, orid, ocid = build_tiles(o, [int(r[0]) for r in ri],
                                 [int(c[0]) for c in ci], n)
    nt = ov.shape[0]
    o_bytes = ov.size * 4
    print(f"offdiag {nt} tiles {o_bytes/1e6:.1f} MB; roofline "
          f"{o_bytes/BW*1e6:.1f} us")

    # sort by row id (host) for sorted scatter / segment_sum
    order = np.argsort(orid, kind="stable")
    ovs, orids, ocids = ov[order], orid[order], ocid[order]
    ovj = jnp.asarray(ovs)
    orj = jnp.asarray(orids)
    ocj = jnp.asarray(ocids)

    def probe(name, fn):
        # chain-safe: result folded into an x-shaped carry (sum can't be DCE'd)
        def wrapped(v):
            r = fn(v)
            return v * 1e-3 + jnp.sum(r) * 1e-6
        f = jax.jit(wrapped)
        f(x).block_until_ready()
        dt = t(f, x)
        print(f"{name:34s}: {dt*1e6:7.1f} us  ({100*(o_bytes/BW)/dt:5.1f}%)")

    x128 = lambda v: v.reshape(n // CC, CC)
    x8 = lambda v: v.reshape(n // RC, RC)

    # 1. gather + einsum only (no scatter): reduce to scalar
    def g_e(v):
        xg = x128(v)[ocj]
        yf = jnp.einsum("tmk,tk->tm", ovj, xg,
                        preferred_element_type=jnp.float32, precision="highest")
        return jnp.sum(yf)
    probe("gather+einsum fwd", g_e)

    # 2. + scatter-add (unsorted claim)
    def g_e_s(v):
        xg = x128(v)[ocj]
        yf = jnp.einsum("tmk,tk->tm", ovj, xg,
                        preferred_element_type=jnp.float32, precision="highest")
        return jnp.zeros((n // RC, RC), jnp.float32).at[orj].add(yf)
    probe("fwd + scatter", g_e_s)

    # 3. + scatter sorted flag
    def g_e_ss(v):
        xg = x128(v)[ocj]
        yf = jnp.einsum("tmk,tk->tm", ovj, xg,
                        preferred_element_type=jnp.float32, precision="highest")
        return jnp.zeros((n // RC, RC), jnp.float32).at[orj].add(
            yf, indices_are_sorted=True)
    probe("fwd + scatter(sorted)", g_e_ss)

    # 4. segment_sum (sorted)
    def g_e_seg(v):
        xg = x128(v)[ocj]
        yf = jnp.einsum("tmk,tk->tm", ovj, xg,
                        preferred_element_type=jnp.float32, precision="highest")
        return jax.ops.segment_sum(yf, orj, num_segments=n // RC,
                                   indices_are_sorted=True)
    probe("fwd + segment_sum", g_e_seg)

    # 5. mirror einsum only
    def m_e(v):
        xr = x8(v)[orj]
        yt = jnp.einsum("tmk,tm->tk", ovj, xr,
                        preferred_element_type=jnp.float32, precision="highest")
        return jnp.sum(yt)
    probe("gather+einsum mirror", m_e)

    # 6. both einsums, no scatters (one-read check)
    def both_e(v):
        xg = x128(v)[ocj]
        xr = x8(v)[orj]
        yf = jnp.einsum("tmk,tk->tm", ovj, xg,
                        preferred_element_type=jnp.float32, precision="highest")
        yt = jnp.einsum("tmk,tm->tk", ovj, xr,
                        preferred_element_type=jnp.float32, precision="highest")
        return jnp.sum(yf) + jnp.sum(yt)
    probe("both einsums no scatter", both_e)

    # 7. full fused symmetric, segment_sum fwd + scatter mirror
    def full(v):
        xg = x128(v)[ocj]
        xr = x8(v)[orj]
        yf = jnp.einsum("tmk,tk->tm", ovj, xg,
                        preferred_element_type=jnp.float32, precision="highest")
        yt = jnp.einsum("tmk,tm->tk", ovj, xr,
                        preferred_element_type=jnp.float32, precision="highest")
        y = jax.ops.segment_sum(yf, orj, num_segments=n // RC,
                                indices_are_sorted=True).reshape(-1)
        y2 = jnp.zeros((n // CC, CC), jnp.float32).at[ocj].add(yt)
        return y + y2.reshape(-1)
    probe("full fused (seg fwd)", full)

    # 8. VPU contraction instead of einsum
    def vpu(v):
        xg = x128(v)[ocj]
        yf = jnp.sum(ovj * xg[:, None, :], axis=-1)
        return jax.ops.segment_sum(yf, orj, num_segments=n // RC,
                                   indices_are_sorted=True)
    probe("fwd VPU + segment_sum", vpu)


if __name__ == "__main__":
    main()
