"""Conjugate Gradient Squared for general (non-hermitian) operators.

Reference: solver/cgs_real.c — the CGS entry of the solver_types enum
(survey 2.6).  Transpose-free like BiCGstab but squares the BiCG
polynomial: faster when BiCG converges smoothly, rougher residual history
otherwise (why the reference keeps both).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["cgs", "CGSResult"]


class CGSResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_sq: jax.Array


def _norm_sq(v):
    return jnp.sum(v.real.astype(jnp.float64) ** 2 + v.imag.astype(jnp.float64) ** 2)


def _cdot(a, b):
    """<a, b> = sum conj(a) b with f64 accumulation."""
    re = jnp.sum(a.real.astype(jnp.float64) * b.real.astype(jnp.float64)
                 + a.imag.astype(jnp.float64) * b.imag.astype(jnp.float64))
    im = jnp.sum(a.real.astype(jnp.float64) * b.imag.astype(jnp.float64)
                 - a.imag.astype(jnp.float64) * b.real.astype(jnp.float64))
    return jax.lax.complex(re, im)


def cgs(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array | None = None,
    tol: float = 1e-9,
    maxiter: int = 2000,
    rel_prec: bool = True,
) -> CGSResult:
    """Sonneveld CGS (two matvecs/iteration, one shadow vector)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    cdt = b.dtype
    b_sq = _norm_sq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    r0 = b - matvec(x0)
    rhat = r0

    st = dict(
        x=x0, r=r0, u=r0, p=r0,
        rho=_cdot(rhat, r0),
        rs=_norm_sq(r0), k=jnp.asarray(0, jnp.int32),
    )

    def cond(st):
        return jnp.logical_and(st["rs"] > target, st["k"] < maxiter)

    def body(st):
        v = matvec(st["p"])
        alpha = st["rho"] / _cdot(rhat, v)
        a32 = alpha.astype(jnp.complex64).astype(cdt)
        q = st["u"] - a32 * v
        uq = st["u"] + q
        x = st["x"] + a32 * uq
        r = st["r"] - a32 * matvec(uq)
        rho_new = _cdot(rhat, r)
        beta = (rho_new / st["rho"]).astype(jnp.complex64).astype(cdt)
        u = r + beta * q
        p = u + beta * (q + beta * st["p"])
        return dict(x=x, r=r, u=u, p=p, rho=rho_new,
                    rs=_norm_sq(r), k=st["k"] + 1)

    st = jax.lax.while_loop(cond, body, st)
    return CGSResult(x=st["x"], iterations=st["k"], residual_sq=st["rs"])
