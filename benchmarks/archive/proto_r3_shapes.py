"""Batched-matvec shape frontier for the canvas engine (TPU).

The chunked pow2 engine contracts [200, 64, 64]-ish buckets at 585-765 GB/s
while the one-hot canvas engine measured 202-390 GB/s on [432, 32, 256]
canvases.  Decompose: for a fixed ~13 MB value stream, sweep the batched
einsum shape [nb, MP, KP] and measure

  einsum   : bmk,bk->bm with RESIDENT xg (contraction ceiling)
  +gather  : xg = x2[cc] native chunk gather (Cc = 32)
  +scatter : full gather/contract/scatter pipeline
  sym      : fused one-read symmetric (fwd + mirror contraction + scatters)
  mv-ref   : dense jnp.dot matvec of the same bytes (chip ceiling)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9
HI = jax.lax.Precision.HIGHEST
rng = np.random.default_rng(0)

TOTAL = 13 * 1024 * 1024 // 4   # ~13 MB of f32 values
N = 4096                        # x length


def t(fn, arg, tag, vb):
    st = chained_time_per_iter(fn, arg, iters_lo=10, iters_hi=50,
                               repeats=3, reduce="stats")
    print(f"  {tag:10s}: {st['min']*1e6:7.1f}/{st['median']*1e6:7.1f} us "
          f"({vb/st['median']/1e9:4.0f} GB/s)", flush=True)


x = jnp.asarray(rng.standard_normal((N,)).astype(np.float32))

A = jnp.asarray(rng.standard_normal((TOTAL // N, N)).astype(np.float32))
t(lambda v: jnp.pad(jnp.dot(A, v, precision=HI), (0, N))[:N] * 1e-3,
  x, "mv-ref", TOTAL * 4)

for MP, KP in ((16, 128), (32, 256), (32, 512), (64, 256), (64, 512),
               (128, 512), (128, 1024), (256, 1024)):
    nb = max(1, TOTAL // (MP * KP))
    Cc, Cr = 32, 8
    vals = jnp.asarray(
        rng.standard_normal((nb, MP, KP)).astype(np.float32))
    vb = vals.size * 4
    KC, MC = KP // Cc, MP // Cr
    NC, NR = N // Cc, N // Cr
    cc = jnp.asarray(rng.integers(0, NC, size=(nb, KC)).astype(np.int32))
    rc_scat = jnp.asarray(
        rng.integers(0, NR - MC, size=(nb, 1)).astype(np.int32)
        + np.arange(MC, dtype=np.int32)[None, :])
    xg0 = jnp.asarray(rng.standard_normal((nb, KP)).astype(np.float32))
    print(f"canvas [{nb:4d}, {MP:3d}, {KP:4d}] ({vb/1e6:.1f} MB)",
          flush=True)

    def pad_chain(y, n=N):
        return jnp.pad(y.reshape(-1), (0, max(0, n)))[:n] * 1e-3

    # 1. contraction ceiling (xg resident; chain via in-place scale)
    def f_einsum(xgv):
        ym = jnp.einsum("bmk,bk->bm", vals, xgv, precision=HI,
                        preferred_element_type=jnp.float32)
        s = jnp.tanh(jnp.sum(ym) * 1e-9)
        return xgv * (1e-3 + s * 1e-20)

    t(f_einsum, xg0, "einsum", vb)

    # 2. + native chunk gather
    def f_gather(v):
        x2 = v.reshape(NC, Cc)
        xg = x2[cc].reshape(nb, KP)
        ym = jnp.einsum("bmk,bk->bm", vals, xg, precision=HI,
                        preferred_element_type=jnp.float32)
        return pad_chain(ym[:, 0])

    t(f_gather, x, "+gather", vb)

    # 3. full pipeline fwd
    def f_full(v):
        x2 = v.reshape(NC, Cc)
        xg = x2[cc].reshape(nb, KP)
        ym = jnp.einsum("bmk,bk->bm", vals, xg, precision=HI,
                        preferred_element_type=jnp.float32)
        y2 = jnp.zeros((NR, Cr), jnp.float32)
        y2 = y2.at[rc_scat].add(ym.reshape(nb, MC, Cr))
        return y2.reshape(-1) * 1e-3

    t(f_full, x, "+scatter", vb)

    # 4. symmetric fused one-read
    def f_sym(v):
        x2 = v.reshape(NC, Cc)
        x8 = v.reshape(NR, Cr)
        xg = x2[cc].reshape(nb, KP)
        xr = x8[rc_scat].reshape(nb, MP)
        ym = jnp.einsum("bmk,bk->bm", vals, xg, precision=HI,
                        preferred_element_type=jnp.float32)
        yt = jnp.einsum("bmk,bm->bk", vals, xr, precision=HI,
                        preferred_element_type=jnp.float32)
        y2 = jnp.zeros((NR, Cr), jnp.float32)
        y2 = y2.at[rc_scat].add(ym.reshape(nb, MC, Cr))
        yc = jnp.zeros((NC, Cc), jnp.float32)
        yc = yc.at[cc].add(yt.reshape(nb, KC, Cc))
        return (y2.reshape(-1) + yc.reshape(-1)[:N]) * 1e-3

    t(f_sym, x, "sym", vb)
