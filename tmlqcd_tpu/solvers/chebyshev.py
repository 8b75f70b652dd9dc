"""Chebyshev polynomial approximation of matrix functions of a hermitian
positive operator (Clenshaw evaluation with rematerialization).

Reference: chebyshev_polynomial_nd.c + Ptilde_nd.c (the PHMC polynomial
machinery, survey §2.7): the reference builds Chebyshev approximations of
s^{-1/2} (and correction polynomials) on [eps, 1] and applies them by
recursion.  Here coefficients come from Gauss-Chebyshev quadrature in
numpy f64 and the application is a jax.checkpoint'ed Clenshaw recursion —
AD through it gives the PHMC force with no hand-written derivative.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["chebyshev_coeffs", "chebyshev_apply", "chebyshev_eval"]


def chebyshev_coeffs(fun: Callable, degree: int, lo: float, hi: float) -> np.ndarray:
    """Chebyshev expansion coefficients c_k of fun on [lo, hi]
    (fun(x) ~ sum_k' c_k T_k(t), t = (2x - hi - lo)/(hi - lo); the k=0 term
    enters with weight 1/2 — the standard convention)."""
    n = degree + 1
    j = np.arange(n)
    t = np.cos(np.pi * (j + 0.5) / n)  # Gauss-Chebyshev nodes
    x = 0.5 * (hi - lo) * t + 0.5 * (hi + lo)
    f = fun(x)
    c = np.empty(n)
    for k in range(n):
        c[k] = (2.0 / n) * np.sum(f * np.cos(np.pi * k * (j + 0.5) / n))
    return c


def chebyshev_eval(coeffs: np.ndarray, x, lo: float, hi: float):
    """Scalar/array evaluation (for error measurement)."""
    t = (2.0 * np.asarray(x, np.float64) - hi - lo) / (hi - lo)
    b1 = np.zeros_like(t)
    b2 = np.zeros_like(t)
    for c in coeffs[:0:-1]:
        b1, b2 = 2.0 * t * b1 - b2 + c, b1
    return t * b1 - b2 + 0.5 * coeffs[0]


def chebyshev_apply(
    matvec: Callable,
    coeffs: np.ndarray,
    x: jax.Array,
    lo: float,
    hi: float,
    remat: bool = True,
) -> jax.Array:
    """fun(A) x via Clenshaw with the affine spectral map
    t(A) = (2A - (hi+lo)) / (hi - lo).  jax.checkpoint on each recursion
    step keeps AD memory O(1) in the degree (the PHMC force path)."""
    a = jnp.asarray(2.0 / (hi - lo), x.real.dtype)
    b = jnp.asarray(-(hi + lo) / (hi - lo), x.real.dtype)

    def tmv(v):
        return a * matvec(v) + b * v

    step = jax.checkpoint(lambda b1, b2, c: 2.0 * tmv(b1) - b2 + jnp.asarray(c, x.real.dtype) * x) if remat else (
        lambda b1, b2, c: 2.0 * tmv(b1) - b2 + jnp.asarray(c, x.real.dtype) * x
    )

    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for c in coeffs[:0:-1]:
        b1, b2 = step(b1, b2, float(c)), b1
    return tmv(b1) - b2 + jnp.asarray(0.5 * coeffs[0], x.real.dtype) * x
