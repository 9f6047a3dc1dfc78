"""Platform ceiling probes: what effective HBM BW can ANY op achieve here?

Separates: pure stream, einsum-no-gather, gather cost, reduce strategies.
python -u benchmarks/proto_ceiling.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.proto_strip import build_tiles, t, BW, RC, CC  # noqa: E402
from blocksparse_tpu.utils.testmatrices import random_symmetric  # noqa: E402


def main():
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
    order = np.argsort(orid, kind="stable")
    ovs, orids, ocids = ov[order], orid[order], ocid[order]
    ovj = jnp.asarray(ovs)
    orj = jnp.asarray(orids)
    ocj = jnp.asarray(ocids)
    print(f"{nt} tiles, {o_bytes/1e6:.1f} MB, roofline {o_bytes/BW*1e6:.1f} us")

    # regather tables for the scatter-free reduce: [n//RC, Lmax]
    nrc = n // RC
    groups = [[] for _ in range(nrc)]
    for tix, rr in enumerate(orids):
        groups[int(rr)].append(tix)
    Lmax = max(len(g) for g in groups)
    print(f"row-chunk groups: Lmax={Lmax}, "
          f"avg={np.mean([len(g) for g in groups]):.1f}")
    reg = np.full((nrc, Lmax), nt, np.int32)  # sentinel -> zero row
    for c, g in enumerate(groups):
        reg[c, :len(g)] = g
    regj = jnp.asarray(reg)

    def probe(name, fn, bytes_=o_bytes):
        def wrapped(v):
            r = fn(v)
            return v * 1e-3 + jnp.sum(r) * 1e-6
        f = jax.jit(wrapped)
        f(x).block_until_ready()
        dt = t(f, x)
        print(f"{name:36s}: {dt*1e6:7.1f} us  ({100*(bytes_/BW)/dt:5.1f}%)")

    ones128 = jnp.ones((128,), jnp.float32)

    # 0. pure stream: contract with a constant vector, no gather
    probe("einsum const-x (no gather)",
          lambda v: jnp.einsum("tmk,k->tm", ovj, ones128 * v[0],
                               preferred_element_type=jnp.float32,
                               precision="highest"))

    # 0b. pure VPU lane reduce
    probe("lane-sum (tmk->tm)", lambda v: jnp.sum(ovj * v[0], axis=2))

    # 0c. flat 2D dot: [nt*8,128] @ [128,1] on MXU
    ov2 = ovj.reshape(nt * RC, CC)
    probe("2D matmul [nt*8,128]@[128,1]",
          lambda v: ov2 @ (ones128 * v[0]))

    # 1. gather + einsum (repeat of strip2 for reference)
    def g_e(v):
        xg = v.reshape(n // CC, CC)[ocj]
        return jnp.einsum("tmk,tk->tm", ovj, xg,
                          preferred_element_type=jnp.float32,
                          precision="highest")
    probe("gather + einsum", g_e)

    # 1b. matmul-gather: one-hot [nt,32] @ x128
    onehot_c = jnp.asarray(
        (ocids[:, None] == np.arange(n // CC)[None, :]).astype(np.float32))
    def mg_e(v):
        xg = onehot_c @ v.reshape(n // CC, CC)
        return jnp.einsum("tmk,tk->tm", ovj, xg,
                          preferred_element_type=jnp.float32,
                          precision="highest")
    probe("onehot-matmul-gather + einsum", mg_e)

    # 2. einsum + regather-reduce (scatter-free)
    def g_e_r(v):
        yf = g_e(v)
        yfe = jnp.concatenate([yf, jnp.zeros((1, RC), jnp.float32)], axis=0)
        return jnp.sum(yfe[regj], axis=1)  # [nrc, RC]
    probe("einsum + regather-reduce", g_e_r)

    # 3. full symmetric one... two-read + regather fwd + scatter mirror
    x8r = lambda v: v.reshape(n // RC, RC)
    def full2(v):
        yf = g_e_r(v)
        xr = x8r(v)[orj]
        yt = jnp.einsum("tmk,tm->tk", ovj, xr,
                        preferred_element_type=jnp.float32,
                        precision="highest")
        y2 = jnp.zeros((n // CC, CC), jnp.float32).at[ocj].add(yt)
        return yf.reshape(-1) + y2.reshape(-1)
    probe("full sym (regather fwd, scat mir)", full2)

    # 3b. mirror via regather too: sort mirror contributions by col chunk
    ncc = n // CC
    mg = [[] for _ in range(ncc)]
    for tix, cc_ in enumerate(ocids):
        mg[int(cc_)].append(tix)
    Lm = max(len(g) for g in mg)
    regm = np.full((ncc, Lm), nt, np.int32)
    for c, g in enumerate(mg):
        regm[c, :len(g)] = g
    regmj = jnp.asarray(regm)
    print(f"col-chunk groups: Lmax={Lm}")
    def full3(v):
        yf = g_e_r(v)
        xr = x8r(v)[orj]
        yt = jnp.einsum("tmk,tm->tk", ovj, xr,
                        preferred_element_type=jnp.float32,
                        precision="highest")
        yte = jnp.concatenate([yt, jnp.zeros((1, CC), jnp.float32)], axis=0)
        ym = jnp.sum(yte[regmj], axis=1)  # [ncc, CC]
        return yf.reshape(-1) + ym.reshape(-1)
    probe("full sym (regather both)", full3)


if __name__ == "__main__":
    main()
