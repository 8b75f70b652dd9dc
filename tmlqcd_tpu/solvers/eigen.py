"""Extremal eigenvalue estimation for hermitian positive operators.

Reference: solver/eigenvalues.c + solver/jdher.c (Jacobi-Davidson), used by
the reference to fix the PHMC/rational approximation interval [s_min, s_max]
to the spectrum of Q^2 (survey §2.6 "Eigensolvers": "power iteration/LOBPCG
in JAX suffices for interval bounds").

- `lambda_max`: power iteration on A (jit-able lax.fori_loop).
- `lambda_min`: inverse power iteration, each step one CG solve — accurate
  near the low edge where the rational approximation must hold tightest.

Both return f64 Rayleigh quotients; callers should widen the interval by a
safety factor (the reference likewise pads StildeMin/StildeMax).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tmlqcd_tpu import rng
from tmlqcd_tpu.solvers.cg import cg

__all__ = ["lambda_max", "lambda_min", "spectral_bounds"]


def _norm_sq(v):
    return jnp.sum(v.real.astype(jnp.float64) ** 2 + v.imag.astype(jnp.float64) ** 2)


def _dot_re(a, b):
    return jnp.sum(
        a.real.astype(jnp.float64) * b.real.astype(jnp.float64)
        + a.imag.astype(jnp.float64) * b.imag.astype(jnp.float64)
    )


def lambda_max(
    matvec: Callable, shape: tuple, key: jax.Array, iters: int = 50, dtype=jnp.complex64
) -> jax.Array:
    """Largest eigenvalue of hermitian positive A by power iteration."""
    v0 = rng.normal_spinor(key, shape, dtype)

    def body(_, v):
        w = matvec(v)
        return w / jnp.sqrt(_norm_sq(w)).astype(w.real.dtype)

    v = jax.lax.fori_loop(0, iters, body, v0)
    w = matvec(v)
    return _dot_re(v, w) / _norm_sq(v)


def lambda_min(
    matvec: Callable,
    shape: tuple,
    key: jax.Array,
    iters: int = 10,
    cg_tol: float = 1e-6,
    cg_maxiter: int = 2000,
    dtype=jnp.complex64,
) -> jax.Array:
    """Smallest eigenvalue by inverse power iteration (CG solves)."""
    v = rng.normal_spinor(key, shape, dtype)
    v = v / jnp.sqrt(_norm_sq(v)).astype(v.real.dtype)
    for _ in range(iters):
        w = cg(matvec, v, tol=cg_tol, maxiter=cg_maxiter).x
        v = w / jnp.sqrt(_norm_sq(w)).astype(w.real.dtype)
    w = matvec(v)
    return _dot_re(v, w) / _norm_sq(v)


def spectral_bounds(
    matvec: Callable,
    shape: tuple,
    key: jax.Array,
    safety: float = 1.3,
    dtype=jnp.complex64,
) -> tuple[jax.Array, jax.Array]:
    """(s_min, s_max) bracketing spec(A), padded by `safety` on both ends —
    feed to solvers.rational.rational_invsqrt (reference: the online
    eigenvalue check of ndrat/phmc init)."""
    k1, k2 = jax.random.split(key)
    lmax = lambda_max(matvec, shape, k1, dtype=dtype)
    lmin = lambda_min(matvec, shape, k2, dtype=dtype)
    return lmin / safety, lmax * safety
