"""Calibrate MXU/VPU primitives for the r=1 redesign (TPU).

What rate does this chip actually sustain on the shapes the block-diagonal
mono-kernel would use?  All f32, HIGHEST.

  mv      : dense matvec [3072, 4096] @ [4096]          (12.6 MB stream)
  mm8     : thin matmul  [3072, 4096] @ [4096, 8]
  mm8T    : dim0-contraction dot_general [4096, 3072]^T-style
  pal8    : Pallas grid over row-panels: dot([128, 4096], [4096, 8])
  pal8bd  : Pallas blockdiag: vals_T [MP, nb*KP] step dot + mask
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9
HI = jax.lax.Precision.HIGHEST
rng = np.random.default_rng(0)

M, K = 4096, 4096
A = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((K,)).astype(np.float32))
X8 = jnp.asarray(rng.standard_normal((K, 8)).astype(np.float32))
ab = A.size * 4


def t(fn, tag, arg):
    st = chained_time_per_iter(fn, arg, iters_lo=10, iters_hi=50,
                               repeats=3, reduce="stats")
    print(f"{tag:8s}: {st['min']*1e6:7.1f}/{st['median']*1e6:7.1f} us "
          f"({ab/st['median']/1e9:4.0f} GB/s on A)", flush=True)


# chain trick: output feeds back scaled
t(lambda v: jnp.dot(A, v, precision=HI) * 1e-3, "mv", x)
t(lambda V: jnp.dot(A, V, precision=HI) * 1e-3, "mm8", X8)

# Pallas: grid over 128-row panels, dot each against X8 (VMEM-resident)
def _kp(x_ref, a_ref, y_ref):
    y_ref[:] = jnp.dot(a_ref[:], x_ref[:], preferred_element_type=jnp.float32,
                       precision=HI)


def pal8(V):
    return pl.pallas_call(
        _kp,
        grid=(M // 128,),
        in_specs=[pl.BlockSpec((K, 8), lambda s: (0, 0)),
                  pl.BlockSpec((128, K), lambda s: (s, 0))],
        out_specs=pl.BlockSpec((128, 8), lambda s: (s, 0)),
        out_shape=jax.ShapeDtypeStruct((M, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(flops=2 * M * K * 8,
                                      bytes_accessed=ab, transcendentals=0),
    )(V, A)


t(lambda V: pal8(V) * 1e-3, "pal8", X8)


# Pallas blockdiag step shape: vals_T [MP, nb*KP], per step dot
# [MP, G*KP] @ XGbd [G*KP, G] built in-kernel from xg_col + iota mask.
def bd_kernel(xg_ref, v_ref, yf_ref, *, KP, G):
    GKP = G * KP
    rows = jax.lax.broadcasted_iota(jnp.int32, (GKP, G), 0) // KP
    cols = jax.lax.broadcasted_iota(jnp.int32, (GKP, G), 1)
    mask = (rows == cols).astype(jnp.float32)
    xgbd = xg_ref[:] * mask
    yf_ref[0] = jnp.dot(v_ref[:], xgbd, preferred_element_type=jnp.float32,
                        precision=HI)


def run_bd(MP, KP, G, nbkp):
    nb = nbkp // KP
    steps = nb // G
    vals_T = jnp.asarray(rng.standard_normal((MP, nbkp)).astype(np.float32))
    vb = vals_T.size * 4

    def f(xgc):
        yf = pl.pallas_call(
            functools.partial(bd_kernel, KP=KP, G=G),
            grid=(steps,),
            in_specs=[pl.BlockSpec((G * KP, 1), lambda s: (s, 0)),
                      pl.BlockSpec((MP, G * KP), lambda s: (0, s))],
            out_specs=pl.BlockSpec((1, MP, G), lambda s: (s, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((steps, MP, G), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(flops=2 * MP * nbkp * G,
                                          bytes_accessed=vb,
                                          transcendentals=0),
        )(xgc)
        return yf.reshape(-1)[:nbkp] * 1e-3

    xgc = jnp.asarray(rng.standard_normal((nbkp, 1)).astype(np.float32))
    st = chained_time_per_iter(lambda v: f(v)[:, None], xgc, iters_lo=10,
                               iters_hi=50, repeats=3, reduce="stats")
    print(f"bd MP={MP:3d} KP={KP:4d} G={G:2d}: "
          f"{st['min']*1e6:7.1f}/{st['median']*1e6:7.1f} us "
          f"({vb/st['median']/1e9:4.0f} GB/s on vals)", flush=True)



for MP in (32, 64, 128):
    nbkp = (4096 // MP) * 4096
    for KP, G in ((512, 8), (512, 16), (1024, 8), (256, 16)):
        if (G * KP) % 128 == 0 and nbkp % (G * KP) == 0:
            run_bd(MP, KP, G, nbkp)
