"""Iterative solvers over the block-sparse operator algebra.

The reference gets iterative solvers for free by being a ``LinearMap``
(/root/reference/src/abstractblockmatrix.jl:13 -- any LinearMaps-compatible
Krylov package consumes it).  Here the analog is twofold:

- every :class:`~blocksparse_tpu.core.operator.LinearOperator` already plugs
  into ``jax.scipy.sparse.linalg`` via ``A.matvec_closure()``;
- this module adds first-class, jit-compilable solvers that accept the
  operators *directly*, support left preconditioning (itself any operator,
  callable, or dense array), and -- unlike ``jax.scipy`` -- report iteration
  count, final residual, and convergence status (``jax.scipy`` returns
  ``info=None`` unconditionally).

All solvers are pure ``lax.while_loop`` programs: static shapes, no
data-dependent Python control flow, so they compile once under ``jit`` and
run on the MXU/VPU end to end (the block SpMV *is* the loop body's hot op).
Works on the CPU backend in f64/c128 at reference tolerances and on TPU in
f32/bf16.

Complex support: CG uses the standard complex-Hermitian recurrences
(``vdot`` inner products); BiCGStab uses the unconjugated shadow-residual
bilinear form, matching textbook/SciPy behavior.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .core.operator import LinearOperator

__all__ = ["SolveInfo", "cg", "bicgstab", "gmres", "as_matvec"]


class SolveInfo(NamedTuple):
    """Outcome of an iterative solve (all fields are jax scalars)."""

    iterations: jax.Array  # int32 number of iterations performed
    residual: jax.Array  # final ||b - A x|| (true residual for cg/bicgstab)
    converged: jax.Array  # bool: residual <= max(tol*||b||, atol)


def as_matvec(A) -> Callable:
    """Normalize an operator-like object to an ``x -> A @ x`` callable.

    Accepts a :class:`LinearOperator` (or any of its lazy wrappers /
    distributed counterparts), a callable, or a dense matrix.
    """
    if isinstance(A, LinearOperator):
        return lambda x: A.apply(x)
    if callable(A) and not hasattr(A, "ndim"):
        return A
    arr = jnp.asarray(A)
    return lambda x: arr @ x


def _as_precond(M) -> Callable:
    if M is None:
        return lambda x: x
    return as_matvec(M)


def _tolerance(b, tol, atol):
    bnorm = jnp.linalg.norm(b)
    return jnp.maximum(tol * bnorm, atol).astype(jnp.real(b).dtype)


def cg(A, b, *, x0=None, tol=1e-6, atol=0.0, maxiter=None, M=None):
    """Preconditioned conjugate gradients for Hermitian positive-definite A.

    Returns ``(x, SolveInfo)``.  ``M`` is a left preconditioner approximating
    ``A^{-1}`` (operator, callable, or dense array).  jit-compatible.
    """
    mv, pre = as_matvec(A), _as_precond(M)
    b = jnp.asarray(b)
    n = b.shape[0]
    if maxiter is None:
        maxiter = 10 * n
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    thresh = _tolerance(b, tol, atol)

    r0 = b - mv(x)
    z0 = pre(r0)
    # state: (k, x, r, z, p, rz)
    state = (jnp.int32(0), x, r0, z0, z0, jnp.vdot(r0, z0))

    def cond(s):
        k, _, r, *_ = s
        return (k < maxiter) & (jnp.linalg.norm(r) > thresh)

    def body(s):
        k, x, r, z, p, rz = s
        ap = mv(p)
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = pre(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return (k + 1, x, r, z, p, rz_new)

    k, x, r, *_ = lax.while_loop(cond, body, state)
    res = jnp.linalg.norm(b - mv(x))
    return x, SolveInfo(k, res, res <= thresh)


def bicgstab(A, b, *, x0=None, tol=1e-6, atol=0.0, maxiter=None, M=None):
    """Preconditioned BiCGStab for general (non-symmetric) square A.

    Returns ``(x, SolveInfo)``.  jit-compatible; breaks down gracefully
    (rho or omega ~ 0 stalls the iteration, leaving the best x so far,
    reported via ``converged``).
    """
    mv, pre = as_matvec(A), _as_precond(M)
    b = jnp.asarray(b)
    n = b.shape[0]
    if maxiter is None:
        maxiter = 10 * n
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    thresh = _tolerance(b, tol, atol)

    r0 = b - mv(x)
    rhat = r0  # shadow residual, fixed
    one = jnp.ones((), b.dtype)
    # state: (k, x, r, p, v, rho, alpha, omega, stalled)
    state = (jnp.int32(0), x, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one, jnp.bool_(False))
    eps = jnp.finfo(jnp.real(b).dtype).tiny * 16

    def cond(s):
        k, _, r, *_, stalled = s
        return (k < maxiter) & (jnp.linalg.norm(r) > thresh) & (~stalled)

    def body(s):
        k, x, r, p, v, rho, alpha, omega, _ = s
        rho_new = jnp.vdot(rhat, r)
        stalled = (jnp.abs(rho_new) < eps) | (jnp.abs(omega) < eps)
        # guard the divisions so a breakdown never pollutes the iterate;
        # when stalled the old state is kept and the loop exits next cond.
        safe = lambda d: jnp.where(stalled, jnp.ones((), d.dtype), d)
        beta = (rho_new / safe(rho)) * (alpha / safe(omega))
        p_new = r + beta * (p - omega * v)
        phat = pre(p_new)
        v_new = mv(phat)
        alpha_new = rho_new / safe(jnp.vdot(rhat, v_new))
        sres = r - alpha_new * v_new
        shat = pre(sres)
        t = mv(shat)
        omega_new = jnp.vdot(t, sres) / safe(jnp.vdot(t, t))
        x_new = x + alpha_new * phat + omega_new * shat
        r_new = sres - omega_new * t
        keep = lambda old, new: jnp.where(stalled, old, new)
        return (
            k + 1,
            keep(x, x_new),
            keep(r, r_new),
            keep(p, p_new),
            keep(v, v_new),
            keep(rho, rho_new),
            keep(alpha, alpha_new),
            keep(omega, omega_new),
            stalled,
        )

    k, x, r, *_ = lax.while_loop(cond, body, state)
    res = jnp.linalg.norm(b - mv(x))
    return x, SolveInfo(k, res, res <= thresh)


def gmres(A, b, *, x0=None, tol=1e-6, atol=0.0, restart=20, maxiter=None, M=None):
    """Restarted GMRES; delegates the Arnoldi machinery to
    ``jax.scipy.sparse.linalg.gmres`` but accepts operators/preconditioners
    in any of this module's forms and reports a true-residual SolveInfo
    (iteration count is not observable through jax.scipy and reports -1).
    """
    mv, pre = as_matvec(A), _as_precond(M)
    b = jnp.asarray(b)
    thresh = _tolerance(b, tol, atol)
    x, _ = jax.scipy.sparse.linalg.gmres(
        mv, b, x0=x0, tol=tol, atol=atol, restart=restart, maxiter=maxiter, M=pre
    )
    res = jnp.linalg.norm(b - mv(x))
    return x, SolveInfo(jnp.int32(-1), res, res <= thresh)
