"""Stage bisection of the patch one-hot SpMV engine on config2 (TPU).

Where do the cycles go: gather matmul, contraction (einsum-HIGHEST vs VPU
multiply+reduce), scatter matmul, mirror pass?
"""
import sys
import jax
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
import importlib
bench = importlib.import_module("bench")
from blocksparse_tpu.core.patch import CC, CR, build_patch_plan
from blocksparse_tpu.ops.patch_engine import patch_device_arrays, _pad_to
from blocksparse_tpu.utils.timing import chained_time_per_iter

BW = 819e9
HI = jax.lax.Precision.HIGHEST

S = bench.build_config2()
n = S.shape[0]
plan = build_patch_plan(S._dlayout, extra_layout=S._olayout,
                        force_canvas=(64, 8))
dev = patch_device_arrays(plan)
(vals, gOH, sOH, flag, _cc, _rs, _mk) = dev[0]
nb, MP, KP = vals.shape
NC, NR = plan.NC, plan.NR
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
vb = vals.size * 4
print(f"canvas ({MP},{KP}) nb={nb} vals {vb/1e6:.1f} MB rho "
      f"{plan.padded_nnz/plan.logical_nnz:.2f}")


def t(f, tag, extra_mb=0.0):
    st = chained_time_per_iter(lambda v: f(v) * 1e-3, x0, iters_lo=10,
                               iters_hi=50, repeats=3, reduce="stats")
    gbps = (vb + extra_mb * 1e6) / st['median'] / 1e9
    print(f"{tag:36s}: {st['median']*1e6:7.1f} us  ({gbps:.0f} GB/s on vals)")


def gather(x):
    x32 = _pad_to(x, (NC + 1) * CC).reshape(NC + 1, CC)
    return jnp.dot(gOH, x32, preferred_element_type=jnp.float32,
                   precision=HI).reshape(nb, KP)


# 1. gather + touch vals (stream floor of this graph shape)
t(lambda x: jnp.pad((gather(x)[:, :1] * 0 + vals[:, 0, :1]).reshape(-1), (0, n))[:n], "gather+touch")

# 2. + contraction, einsum HIGHEST
def c_eins(x):
    xg = gather(x)
    yp = jnp.einsum("bmk,bk->bm", vals, xg,
                    preferred_element_type=jnp.float32, precision=HI)
    return yp.reshape(-1)[:n]
t(c_eins, "gather+einsum(HIGHEST)")

# 3. + contraction, VPU multiply+lane-reduce (exact f32)
def c_vpu(x):
    xg = gather(x)
    yp = jnp.sum(vals * xg[:, None, :], axis=2)
    return yp.reshape(-1)[:n]
t(c_vpu, "gather+vpu-reduce")

# 4. full forward (einsum) + scatter
def full_fwd(x, contract):
    xg = gather(x)
    if contract == "eins":
        yp = jnp.einsum("bmk,bk->bm", vals, xg,
                        preferred_element_type=jnp.float32, precision=HI)
    else:
        yp = jnp.sum(vals * xg[:, None, :], axis=2)
    upd = jnp.dot(sOH.T, yp.reshape(nb * (MP // CR), CR),
                  preferred_element_type=jnp.float32, precision=HI)
    return upd.reshape(-1)[:n]
t(lambda x: full_fwd(x, "eins"), "fwd full (einsum)")
t(lambda x: full_fwd(x, "vpu"), "fwd full (vpu)")

# 5. mirror pass alone (gather rows, transposed contraction, scatter cols)
def mirror(x, contract):
    x8 = _pad_to(x, (NR + 1) * CR).reshape(NR + 1, CR)
    xr = jnp.dot(sOH, x8, preferred_element_type=jnp.float32,
                 precision=HI).reshape(nb, MP)
    if contract == "eins":
        yt = jnp.einsum("bmk,bm->bk", vals, xr,
                        preferred_element_type=jnp.float32, precision=HI)
    else:
        yt = jnp.sum(vals * xr[:, :, None], axis=1)
    yt = yt * jnp.repeat(flag, CC, axis=1)
    updT = jnp.dot(gOH.T, yt.reshape(nb * (KP // CC), CC),
                   preferred_element_type=jnp.float32, precision=HI)
    return updT.reshape(-1)[:n]
t(lambda x: mirror(x, "eins"), "mirror alone (einsum)")
t(lambda x: mirror(x, "vpu"), "mirror alone (vpu)")

# 6. fused both, vpu
t(lambda x: full_fwd(x, "vpu") + mirror(x, "vpu"), "fused fwd+mirror (vpu)")
t(lambda x: full_fwd(x, "eins") + mirror(x, "eins"), "fused fwd+mirror (eins)")
