"""Config1 microscope: floor, stream, gather, scatter at the 3.3MB scale.

python -u benchmarks/proto_c1.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402

BW = 819e9
HI = jax.lax.Precision.HIGHEST


def t(fn, x0):
    return chained_time_per_iter(fn, x0, iters_lo=10, iters_hi=60, repeats=5,
                                 reduce="min")


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(7)
    n, nb, bs = 4096, 200, 64
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nb, replace=False)
    rows = (pos // ntiles) * bs
    cols = (pos % ntiles) * bs
    blocks = np.stack([rng.standard_normal((bs, bs)).astype(np.float32)
                       for _ in range(nb)])
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    bytes_min = nb * bs * bs * 4 + 2 * n * 4
    roof = bytes_min / BW

    # merged layout (pairs along k): [ng, 64, 128]
    by_row = {}
    for i in range(nb):
        by_row.setdefault(rows[i] // bs, []).append(i)
    mv_, mcc_, mrc_ = [], [], []
    for r0, ids in by_row.items():
        i = 0
        while i + 2 <= len(ids):
            g = ids[i:i + 2]
            mv_.append(np.concatenate([blocks[j] for j in g], axis=1))
            mcc_.append([cols[j] // bs for j in g])
            mrc_.append(r0)
            i += 2
        for j in ids[i:]:
            mv_.append(np.concatenate(
                [blocks[j], np.zeros((bs, bs), np.float32)], axis=1))
            mcc_.append([cols[j] // bs, ntiles])  # sentinel -> zero chunk
            mrc_.append(r0)
    ng = len(mv_)
    mv = jnp.asarray(np.stack(mv_))
    mcc = jnp.asarray(np.asarray(mcc_, np.int32))
    mrc = jnp.asarray(np.asarray(mrc_, np.int32))
    print(f"{ng} merged groups, {mv.size*4/1e6:.2f} MB "
          f"(roofline {roof*1e6:.2f} us)")

    def probe(name, fn):
        def wrapped(v):
            return v * 0.999 + fn(v) * 1e-6
        f = jax.jit(wrapped)
        f(x).block_until_ready()
        dt = t(f, x)
        print(f"{name:34s}: {dt*1e6:6.2f} us  ({100*roof/dt:5.1f}%)")

    # 0. platform floor
    probe("floor (x*0.999 only)", lambda v: jnp.float32(0.0))
    # 0b. floor + small reduce of x
    probe("floor + sum(x)", lambda v: jnp.sum(v))

    # 1. stream vals only: einsum with const x (vals can't be folded: mult by v[0])
    ones = jnp.ones((128,), jnp.float32)

    def stream_e(v):
        xg = jnp.broadcast_to(ones * v[0], (ng, 128))
        return jnp.sum(jnp.einsum("bmk,bk->bm", mv, xg, precision=HI,
                                  preferred_element_type=jnp.float32))
    probe("einsum const-x HIGHEST", stream_e)

    def stream_vpu(v):
        return jnp.sum(jnp.sum(mv * (ones * v[0])[None, None, :], axis=-1))
    probe("VPU mult+lanesum const-x", stream_vpu)

    # 2. + gather (chunk gather of x)
    x_ext = lambda v: jnp.concatenate(
        [v.reshape(ntiles, bs), jnp.zeros((1, bs), jnp.float32)], 0)

    def g_e(v):
        xg = x_ext(v)[mcc].reshape(ng, 128)
        return jnp.sum(jnp.einsum("bmk,bk->bm", mv, xg, precision=HI,
                                  preferred_element_type=jnp.float32))
    probe("gather + einsum", g_e)

    # 3. full: + scatter
    def full(v):
        xg = x_ext(v)[mcc].reshape(ng, 128)
        yp = jnp.einsum("bmk,bk->bm", mv, xg, precision=HI,
                        preferred_element_type=jnp.float32)
        y2 = jnp.zeros((ntiles, bs), jnp.float32).at[mrc].add(yp)
        return y2.reshape(n)
    probe("full (gather/einsum/scatter)", full)

    # 3b. full with one-hot matmul gather + scatter
    oc = np.zeros((ng, 2, ntiles + 1), np.float32)
    for i, cc2 in enumerate(mcc_):
        oc[i, 0, cc2[0]] = 1.0
        oc[i, 1, cc2[1]] = 1.0
    orr = np.zeros((ntiles, ng), np.float32)
    for i, r0 in enumerate(mrc_):
        orr[r0, i] = 1.0
    ocj = jnp.asarray(oc.reshape(ng * 2, ntiles + 1), jnp.bfloat16)
    orj = jnp.asarray(orr, jnp.bfloat16)

    def full_onehot(v):
        xe = x_ext(v)
        xg = jnp.einsum("gc,ck->gk", ocj.astype(jnp.float32), xe,
                        precision=HI).reshape(ng, 128)
        yp = jnp.einsum("bmk,bk->bm", mv, xg, precision=HI,
                        preferred_element_type=jnp.float32)
        y2 = jnp.einsum("rb,bm->rm", orj.astype(jnp.float32), yp,
                        precision=HI)
        return y2.reshape(n)
    probe("full one-hot matmul g/s", full_onehot)

    # correctness of 3b
    A = np.zeros((n, n), np.float32)
    for b in range(nb):
        A[rows[b]:rows[b]+bs, cols[b]:cols[b]+bs] += blocks[b]
    ref = A @ np.asarray(x)
    got = np.asarray(jax.jit(full_onehot)(x))
    print("one-hot err:", np.max(np.abs(got - ref)) / np.max(np.abs(ref)))


if __name__ == "__main__":
    main()
