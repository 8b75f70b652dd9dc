"""Conjugate gradient for hermitian positive-definite operators.

Reference: solver/cg_her.c `cg_her(x, b, maxiter, eps_sq, rel_prec, N, f)` —
the workhorse behind every pseudofermion heatbath/acceptance/force solve.

TPU-native shape: the matvec is a closure over (sharded) gauge fields; the
iteration is a `lax.while_loop` fully inside jit, so the whole CG — matvec
stencils, halo collectives, and the two dot-product psums per iteration —
compiles to a single XLA program (reference crosses MPI per iteration for
exactly these two Allreduces; see survey §3.3).

Dot products are accumulated in f64 (survey §7 "precision of DeltaH and CG"):
field stays complex64, per-site |r|^2 partials are upcast before the global
sum.  `rel_prec` toggles relative (|r|^2 < tol^2 |b|^2) vs absolute stopping,
mirroring the reference's flag.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["cg", "cg_info", "cg_rhs", "CGResult"]


class CGResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_sq: jax.Array


def _norm_sq(v: jax.Array) -> jax.Array:
    """|v|^2 with f64 accumulation."""
    return jnp.sum(
        (v.real.astype(jnp.float64)) ** 2 + (v.imag.astype(jnp.float64)) ** 2
    )


def _dot_re(a: jax.Array, b: jax.Array) -> jax.Array:
    """Re<a,b> with f64 accumulation (sufficient for hermitian CG alphas)."""
    return jnp.sum(
        a.real.astype(jnp.float64) * b.real.astype(jnp.float64)
        + a.imag.astype(jnp.float64) * b.imag.astype(jnp.float64)
    )


def cg(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array | None = None,
    tol: float = 1e-9,
    maxiter: int = 1000,
    rel_prec: bool = True,
) -> CGResult:
    """Solve A x = b for hermitian positive-definite A.

    Stopping: |r|^2 <= tol^2 * |b|^2 (rel_prec) or |r|^2 <= tol^2 (absolute).
    Always runs at most `maxiter` iterations (static bound for XLA).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_sq = _norm_sq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    r0 = b - matvec(x0)
    rs0 = _norm_sq(r0)

    def cond(state):
        _, _, _, rs, k = state
        return jnp.logical_and(rs > target, k < maxiter)

    def body(state):
        x, r, p, rs, k = state
        ap = matvec(p)
        alpha = (rs / _dot_re(p, ap)).astype(jnp.float64)
        a32 = alpha.astype(x.real.dtype)
        x = x + a32 * p
        r = r - a32 * ap
        rs_new = _norm_sq(r)
        beta = (rs_new / rs).astype(x.real.dtype)
        p = r + beta * p
        return (x, r, p, rs_new, k + 1)

    x, r, p, rs, k = jax.lax.while_loop(cond, body, (x0, r0, r0, rs0, jnp.asarray(0, jnp.int32)))
    return CGResult(x=x, iterations=k, residual_sq=rs)


def cg_rhs(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    rhs_axis: int,
    x0: jax.Array | None = None,
    tol: float = 1e-9,
    maxiter: int = 1000,
    rel_prec: bool = True,
) -> CGResult:
    """Simultaneous CG over a batch of right-hand sides stacked along
    `rhs_axis` of b (independent Krylov recurrences, shared matvec).

    The matvec must act on the full batched array (e.g. the multi-RHS
    Pallas operator, which amortizes the gauge stream over the batch —
    dslash_pallas multi-RHS build).  Each side gets its own alpha/beta/
    stopping; converged sides freeze (alpha = beta = 0) while the rest
    iterate, so the returned per-side residuals all satisfy the target
    unless maxiter hits.  residual_sq has shape [R]; iterations is the max
    over sides.  (reference: invert.c runs the 12 spin-color source columns
    as independent cg_her calls — here one batched solve feeds the
    multi-RHS kernel.)"""
    axes = tuple(i for i in range(b.ndim) if i != rhs_axis)
    bshape = tuple(
        b.shape[rhs_axis] if i == rhs_axis else 1 for i in range(b.ndim)
    )

    def nsq(v):
        return jnp.sum(
            v.real.astype(jnp.float64) ** 2 + v.imag.astype(jnp.float64) ** 2,
            axis=axes,
        )

    def dot_re(a, c):
        return jnp.sum(
            a.real.astype(jnp.float64) * c.real.astype(jnp.float64)
            + a.imag.astype(jnp.float64) * c.imag.astype(jnp.float64),
            axis=axes,
        )

    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_sq = nsq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    r0 = b - matvec(x0)
    rs0 = nsq(r0)
    tiny = jnp.float64(1e-300)

    def cond(state):
        _, _, _, rs, k = state
        return jnp.logical_and(jnp.any(rs > target), k < maxiter)

    def body(state):
        x, r, p, rs, k = state
        live = rs > target
        ap = matvec(p)
        alpha = jnp.where(live, rs / jnp.maximum(dot_re(p, ap), tiny), 0.0)
        a32 = alpha.astype(x.real.dtype).reshape(bshape)
        x = x + a32 * p
        r = r - a32 * ap
        rs_new = nsq(r)
        beta = jnp.where(live, rs_new / jnp.maximum(rs, tiny), 0.0)
        p = r + beta.astype(x.real.dtype).reshape(bshape) * p
        return (x, r, p, jnp.where(live, rs_new, rs), k + 1)

    x, r, p, rs, k = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rs0, jnp.asarray(0, jnp.int32))
    )
    return CGResult(x=x, iterations=k, residual_sq=rs)


def cg_info(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    **kwargs,
) -> tuple[CGResult, jax.Array]:
    """cg + the TRUE residual |b - A x|^2 recomputed from the returned
    solution (diagnostic wrapper; the iterated CG residual drifts from the
    true one in finite precision — reference: the final true-residual
    printout of cg_her at g_debug_level > 0)."""
    res = cg(matvec, b, **kwargs)
    true_rsq = _norm_sq(b - matvec(res.x))
    return res, true_rsq
