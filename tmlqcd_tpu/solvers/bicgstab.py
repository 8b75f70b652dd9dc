"""BiCGstab for general (non-hermitian) operators.

Reference: solver/bicgstab_complex.c — used by `invert` directly on D when
gamma5 R/L preconditioning of the normal equations is not wanted.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["bicgstab", "BiCGResult"]


class BiCGResult(NamedTuple):
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


def bicgstab(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array | None = None,
    tol: float = 1e-9,
    maxiter: int = 2000,
    rel_prec: bool = True,
) -> BiCGResult:
    if x0 is None:
        x0 = jnp.zeros_like(b)
    cdt = b.dtype
    b_sq = _norm_sq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    r0 = b - matvec(x0)
    rhat = r0

    st = dict(
        x=x0, r=r0, p=jnp.zeros_like(b), v=jnp.zeros_like(b),
        rho=jnp.asarray(1.0 + 0.0j, jnp.complex128),
        alpha=jnp.asarray(1.0 + 0.0j, jnp.complex128),
        omega=jnp.asarray(1.0 + 0.0j, jnp.complex128),
        rs=_norm_sq(r0), k=jnp.asarray(0, jnp.int32),
    )

    def cond(st):
        return jnp.logical_and(st["rs"] > target, st["k"] < maxiter)

    def body(st):
        rho_new = _cdot(rhat, st["r"])
        beta = (rho_new / st["rho"]) * (st["alpha"] / st["omega"])
        p = st["r"] + beta.astype(cdt) * (st["p"] - st["omega"].astype(cdt) * st["v"])
        v = matvec(p)
        alpha = rho_new / _cdot(rhat, v)
        s = st["r"] - alpha.astype(cdt) * v
        t = matvec(s)
        omega = _cdot(t, s) / _norm_sq(t).astype(jnp.complex128)
        x = st["x"] + alpha.astype(cdt) * p + omega.astype(cdt) * s
        r = s - omega.astype(cdt) * t
        return dict(x=x, r=r, p=p, v=v, rho=rho_new, alpha=alpha, omega=omega,
                    rs=_norm_sq(r), k=st["k"] + 1)

    st = jax.lax.while_loop(cond, body, st)
    return BiCGResult(x=st["x"], iterations=st["k"], residual_sq=st["rs"])
