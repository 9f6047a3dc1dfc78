"""Ablations: where does config-1 SpMV time go, and does lane padding
double the streaming traffic for [*, 64, 64] f32 arrays?

python benchmarks/proto_ablate.py
"""

import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from blocksparse_tpu.utils.timing import chained_time_per_iter  # noqa: E402


def t(fn, x0, **kw):
    return chained_time_per_iter(fn, x0, iters_lo=10, iters_hi=60, repeats=5,
                                 reduce="min", **kw)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(7)
    n = 4096
    nb, bs = 200, 64
    ntiles = n // bs
    pos = rng.choice(ntiles * ntiles, size=nb, replace=False)
    rows = (pos // ntiles) * bs
    cols = (pos % ntiles) * bs
    vals = jnp.asarray(rng.standard_normal((nb, bs, bs)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    BW = 819e9

    # -- 1. pure-read: does [200,64,64] stream like 3.3MB or 6.5MB? --------
    v_flat = vals.reshape(-1, 128)      # [6400, 128] dense layout
    v_6464 = vals                        # [200, 64, 64]
    v_64128 = vals.reshape(100, 64, 128)  # hmm: reinterpret, still dense data

    for name, v in [("[6400,128]", v_flat), ("[200,64,64]", v_6464),
                    ("[100,64,128]", v_64128)]:
        # read-sum; output vector chained via broadcast trick
        def rd(u, v=v):
            s = jnp.sum(v) * 1e-20
            return u * 0.999 + s
        dt = t(rd, x)
        gbps = v.size * 4 / dt / 1e9
        print(f"read {name}: {dt*1e6:.2f} us -> {gbps:.0f} GB/s effective")

    # -- 2. chunked-engine stages, C=64 -------------------------------------
    C = 64
    rc = jnp.asarray((rows // C).astype(np.int32))          # [nb]
    cc = jnp.asarray((cols // C).astype(np.int32))

    def gather_contract(u):
        x2 = u.reshape(n // C, C)
        xg = x2[cc]                       # [nb, C]
        yp = jnp.sum(vals * xg[:, None, :], axis=-1)  # [nb, C]
        return u * 0.999 + jnp.sum(yp) * 1e-20

    def full(u):
        x2 = u.reshape(n // C, C)
        xg = x2[cc]
        yp = jnp.sum(vals * xg[:, None, :], axis=-1)
        y2 = jnp.zeros((n // C, C), jnp.float32).at[rc].add(yp)
        return y2.reshape(n) * 1e-3 + u * 0.5

    def scatter_only(u):
        yp = vals[:, :, 0] + u[0]         # reads vals (cheap slice? no - full)
        y2 = jnp.zeros((n // C, C), jnp.float32).at[rc].add(yp)
        return y2.reshape(n) * 1e-3 + u * 0.5

    print(f"gather+contract: {t(gather_contract, x)*1e6:.2f} us")
    print(f"full path      : {t(full, x)*1e6:.2f} us")

    # -- 3. merged layout: pair blocks sharing a row chunk -------------------
    by_row = {}
    for i in range(nb):
        by_row.setdefault(rows[i] // C, []).append(i)
    merged_vals, merged_cc, merged_rc = [], [], []
    GK = 2  # merge pairs -> kp=128
    leftovers = []
    for r0, ids in by_row.items():
        i = 0
        while i + GK <= len(ids):
            grp = ids[i:i + GK]
            merged_vals.append(np.concatenate(
                [np.asarray(vals[g]) for g in grp], axis=1))
            merged_cc.append([cols[g] // C for g in grp])
            merged_rc.append(r0)
            i += GK
        leftovers.extend(ids[i:])
    # pad leftovers with a zero partner reading chunk 0
    for g in leftovers:
        merged_vals.append(np.concatenate(
            [np.asarray(vals[g]), np.zeros((bs, bs), np.float32)], axis=1))
        merged_cc.append([cols[g] // C, 0])
        merged_rc.append(rows[g] // C)
    mv = jnp.asarray(np.stack(merged_vals))          # [ng, 64, 128]
    mcc = jnp.asarray(np.asarray(merged_cc, np.int32))  # [ng, 2]
    mrc = jnp.asarray(np.asarray(merged_rc, np.int32))
    ng = mv.shape[0]
    print(f"merged: {ng} groups ({len(leftovers)} padded leftovers), "
          f"stored {mv.size*4/1e6:.2f} MB")

    def merged_full(u):
        x2 = u.reshape(n // C, C)
        xg = x2[mcc].reshape(ng, 2 * C)   # [ng, 128]
        yp = jnp.sum(mv * xg[:, None, :], axis=-1)  # [ng, 64]
        y2 = jnp.zeros((n // C, C), jnp.float32).at[mrc].add(yp)
        return y2.reshape(n) * 1e-3 + u * 0.5

    # correctness
    A = np.zeros((n, n), np.float32)
    for b in range(nb):
        A[rows[b]:rows[b]+bs, cols[b]:cols[b]+bs] += np.asarray(vals[b])
    ref = A @ np.asarray(x)
    got = np.asarray(merged_full(x)) - np.asarray(x) * 0.5
    err = np.max(np.abs(got * 1e3 - ref)) / np.max(np.abs(ref))
    print(f"merged rel err: {err:.2e}")
    dtm = t(merged_full, x)
    bytes_min = nb * bs * bs * 4 + 2 * n * 4
    print(f"merged full    : {dtm*1e6:.2f} us -> "
          f"{100*(bytes_min/BW)/dtm:.1f}% of min-bytes roofline")

    # merge 4 -> kp=256
    by_row2 = {}
    for i in range(nb):
        by_row2.setdefault(rows[i] // C, []).append(i)
    m4_vals, m4_cc, m4_rc = [], [], []
    for r0, ids in by_row2.items():
        for i in range(0, len(ids), 4):
            grp = ids[i:i+4]
            pad = 4 - len(grp)
            vv = [np.asarray(vals[g]) for g in grp] + \
                 [np.zeros((bs, bs), np.float32)] * pad
            m4_vals.append(np.concatenate(vv, axis=1))
            m4_cc.append([cols[g] // C for g in grp] + [0] * pad)
            m4_rc.append(r0)
    m4v = jnp.asarray(np.stack(m4_vals))
    m4cc = jnp.asarray(np.asarray(m4_cc, np.int32))
    m4rc = jnp.asarray(np.asarray(m4_rc, np.int32))
    ng4 = m4v.shape[0]
    print(f"merge4: {ng4} groups, stored {m4v.size*4/1e6:.2f} MB")

    def merged4_full(u):
        x2 = u.reshape(n // C, C)
        xg = x2[m4cc].reshape(ng4, 4 * C)
        yp = jnp.sum(m4v * xg[:, None, :], axis=-1)
        y2 = jnp.zeros((n // C, C), jnp.float32).at[m4rc].add(yp)
        return y2.reshape(n) * 1e-3 + u * 0.5

    got4 = (np.asarray(merged4_full(x)) - np.asarray(x) * 0.5) * 1e3
    print(f"merge4 rel err: {np.max(np.abs(got4-ref))/np.max(np.abs(ref)):.2e}")
    dt4 = t(merged4_full, x)
    print(f"merge4 full    : {dt4*1e6:.2f} us -> "
          f"{100*(bytes_min/BW)/dt4:.1f}% of min-bytes roofline")

    # -- 4. symmetric one-read: two contractions from one vals read ---------
    def sym_two_pass(u):
        x2 = u.reshape(n // C, C)
        xg = x2[cc]
        yp = jnp.sum(vals * xg[:, None, :], axis=-1)
        y2 = jnp.zeros((n // C, C), jnp.float32).at[rc].add(yp)
        xr = x2[rc]
        yt = jnp.sum(vals * xr[:, :, None], axis=1)   # transpose contraction
        y2 = y2.at[cc].add(yt)
        return y2.reshape(n) * 1e-3 + u * 0.5

    refS = (A + A.T) @ np.asarray(x)
    gotS = (np.asarray(sym_two_pass(x)) - np.asarray(x) * 0.5) * 1e3
    print(f"sym fused rel err: {np.max(np.abs(gotS-refS))/np.max(np.abs(refS)):.2e}")
    dts = t(sym_two_pass, x)
    print(f"sym fused (one read, 2 contractions): {dts*1e6:.2f} us vs "
          f"2x separate ~{2*t(full, x)*1e6:.2f} us")


if __name__ == "__main__":
    main()
