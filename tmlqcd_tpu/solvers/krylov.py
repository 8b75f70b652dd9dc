"""Non-hermitian Krylov solvers: FGMRES(m), GCR(m), MR — for solving D x = b
directly (propagator inversion on the unsquared operator) and as the outer
solver around multigrid/deflation preconditioners.

Reference: solver/gmres.c, solver/fgmres.c, solver/gcr.c, solver/mr.c
(uniform `matrix_mult` signature, survey §2.6).  FGMRES is *flexible*: the
preconditioner may change between iterations (required for the inexact
2-level Schwarz/deflation preconditioner, reference: dfl_projector.c used
inside DFLFGMRES/DFLGCR).

TPU shape: restart cycles are Python-unrolled (static m), inner Arnoldi
steps are a lax.fori_loop over a preallocated [m+1, ...field] basis; the
small (m+1) x m Hessenberg lives as a dense array and the least-squares
solve is a tiny host-side-free jnp.linalg.lstsq at the end of each cycle.
Complex dots accumulate in complex128 (survey §7 precision note).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["fgmres", "gcr", "mr", "KrylovResult"]


class KrylovResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_sq: jax.Array


def _cdot(a, b):
    """<a, b> (conjugate-linear in a), complex128 accumulation."""
    return jnp.sum(jnp.conj(a.astype(jnp.complex128)) * b.astype(jnp.complex128))


def _norm_sq(v):
    return jnp.sum(v.real.astype(jnp.float64) ** 2 + v.imag.astype(jnp.float64) ** 2)


def fgmres(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array | None = None,
    precond: Callable[[jax.Array], jax.Array] | None = None,
    tol: float = 1e-9,
    restart: int = 20,
    max_restarts: int = 50,
    rel_prec: bool = True,
) -> KrylovResult:
    """Flexible GMRES with restarts (reference: fgmres.c; gmres.c is the
    precond=None special case)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        precond = lambda v: v
    m = restart
    b_sq = _norm_sq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    def cycle(carry):
        x, rs, it, done = carry
        r = b - matvec(x)
        beta = jnp.sqrt(_norm_sq(r))
        v0 = (r / beta.astype(r.real.dtype)).astype(b.dtype)

        vs = jnp.zeros((m + 1,) + b.shape, b.dtype).at[0].set(v0)
        zs = jnp.zeros((m,) + b.shape, b.dtype)
        h = jnp.zeros((m + 1, m), jnp.complex128)

        def arnoldi(j, st):
            vs, zs, h = st
            z = precond(vs[j])
            w = matvec(z)
            # modified Gram-Schmidt
            def mgs(i, acc):
                w, h = acc
                hij = _cdot(vs[i], w)
                w = w - hij.astype(b.dtype) * vs[i]
                return (w, h.at[i, j].set(hij))

            w, h = jax.lax.fori_loop(0, j + 1, mgs, (w, h))
            hn = jnp.sqrt(_norm_sq(w))
            h = h.at[j + 1, j].set(hn.astype(jnp.complex128))
            vnext = (w / jnp.maximum(hn, 1e-300).astype(w.real.dtype)).astype(b.dtype)
            vs = vs.at[j + 1].set(vnext)
            zs = zs.at[j].set(z)
            return (vs, zs, h)

        vs, zs, h = jax.lax.fori_loop(0, m, arnoldi, (vs, zs, h))

        # least squares: min || beta e1 - H y ||
        e1 = jnp.zeros((m + 1,), jnp.complex128).at[0].set(beta.astype(jnp.complex128))
        y, *_ = jnp.linalg.lstsq(h, e1)
        dx = jnp.tensordot(y.astype(b.dtype), zs, axes=(0, 0))
        x_new = x + dx
        rs_new = _norm_sq(b - matvec(x_new))
        improved = rs_new < rs
        x_out = jnp.where(improved, x_new, x)
        rs_out = jnp.where(improved, rs_new, rs)
        return (x_out, rs_out, it + 1, jnp.logical_not(improved))

    def cond(carry):
        x, rs, it, done = carry
        return jnp.logical_and(jnp.logical_and(rs > target, it < max_restarts),
                               jnp.logical_not(done))

    r0 = b - matvec(x0)
    st = (x0, _norm_sq(r0), jnp.asarray(0, jnp.int32), jnp.asarray(False))
    x, rs, it, _ = jax.lax.while_loop(cond, cycle, st)
    return KrylovResult(x=x, iterations=it, residual_sq=rs)


def gcr(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array | None = None,
    precond: Callable[[jax.Array], jax.Array] | None = None,
    tol: float = 1e-9,
    restart: int = 20,
    max_restarts: int = 50,
    rel_prec: bool = True,
) -> KrylovResult:
    """Restarted (flexible) GCR (reference: gcr.c — the outer solver of the
    deflation-preconditioned stack, DFLGCR)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        precond = lambda v: v
    m = restart
    b_sq = _norm_sq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    def cycle(carry):
        x, rs, it, done = carry
        r = b - matvec(x)

        ps = jnp.zeros((m,) + b.shape, b.dtype)
        aps = jnp.zeros((m,) + b.shape, b.dtype)

        def inner(j, st):
            x, r, ps, aps = st
            p = precond(r)
            ap = matvec(p)

            def ortho(i, acc):
                p, ap = acc
                beta = _cdot(aps[i], ap)  # <Ap_i, Ap> / |Ap_i|^2 (normalized below)
                p = p - beta.astype(b.dtype) * ps[i]
                ap = ap - beta.astype(b.dtype) * aps[i]
                return (p, ap)

            p, ap = jax.lax.fori_loop(0, j, ortho, (p, ap))
            nrm = jnp.sqrt(_norm_sq(ap))
            inv = (1.0 / jnp.maximum(nrm, 1e-300)).astype(b.real.dtype)
            p, ap = p * inv, ap * inv
            alpha = _cdot(ap, r)
            x = x + alpha.astype(b.dtype) * p
            r = r - alpha.astype(b.dtype) * ap
            return (x, r, ps.at[j].set(p), aps.at[j].set(ap))

        x_new, r_new, _, _ = jax.lax.fori_loop(0, m, inner, (x, r, ps, aps))
        rs_new = _norm_sq(r_new)
        improved = rs_new < rs
        x_out = jnp.where(improved, x_new, x)
        rs_out = jnp.where(improved, rs_new, rs)
        return (x_out, rs_out, it + 1, jnp.logical_not(improved))

    def cond(carry):
        x, rs, it, done = carry
        return jnp.logical_and(jnp.logical_and(rs > target, it < max_restarts),
                               jnp.logical_not(done))

    st = (x0, _norm_sq(b - matvec(x0)), jnp.asarray(0, jnp.int32), jnp.asarray(False))
    x, rs, it, _ = jax.lax.while_loop(cond, cycle, st)
    return KrylovResult(x=x, iterations=it, residual_sq=rs)


def mr(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array | None = None,
    tol: float = 1e-9,
    maxiter: int = 1000,
    omega: float = 1.0,
    rel_prec: bool = True,
) -> KrylovResult:
    """Minimal residual iteration (reference: mr.c — the cheap smoother used
    inside the domain-decomposition preconditioner blocks)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_sq = _norm_sq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    def cond(st):
        x, r, rs, k = st
        return jnp.logical_and(rs > target, k < maxiter)

    def body(st):
        x, r, rs, k = st
        ar = matvec(r)
        alpha = omega * _cdot(ar, r) / jnp.maximum(_norm_sq(ar), 1e-300)
        x = x + alpha.astype(b.dtype) * r
        r = r - alpha.astype(b.dtype) * ar
        return (x, r, _norm_sq(r), k + 1)

    r0 = b - matvec(x0)
    x, r, rs, k = jax.lax.while_loop(
        cond, body, (x0, r0, _norm_sq(r0), jnp.asarray(0, jnp.int32))
    )
    return KrylovResult(x=x, iterations=k, residual_sq=rs)
