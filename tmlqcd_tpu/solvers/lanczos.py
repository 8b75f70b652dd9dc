"""Hermitian Lanczos with full reorthogonalization: Ritz pairs of a
matrix-free hermitian operator.

Reference: solver/eigenvalues.c + solver/jdher.c (Jacobi-Davidson) — the
reference computes the lowest eigenpairs of Q^2 (to deflate the overlap sign
function and to fix PHMC/rational intervals) with JD/ARPACK-grade
eigensolvers.  On TPU a Lanczos sweep with full reorthogonalization is the
idiomatic equivalent: the three-term recurrence is pure matvecs + BLAS-1
(XLA-fused), the small tridiagonal eigenproblem is solved on host in f64,
and full reorthogonalization (cheap at the k <= O(100) used for deflation
subspaces) removes the classical ghost-eigenvalue pathology that makes
bare Lanczos untrustworthy in f32.

Setup-grade code: runs once per gauge configuration (like the reference's
eigensolver init), a Python loop of jitted steps — not itself jittable.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lanczos_herm", "lowest_eigenpairs", "RitzPairs"]


class RitzPairs(NamedTuple):
    values: np.ndarray  # [k] Ritz values, ascending
    vectors: jax.Array  # [k, *field_shape] Ritz vectors (unit norm)
    residuals: np.ndarray  # [k] |A v - theta v| per pair


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """<a, b> with f64 accumulation (complex)."""
    ar, ai = a.real.astype(jnp.float64), a.imag.astype(jnp.float64)
    br, bi = b.real.astype(jnp.float64), b.imag.astype(jnp.float64)
    return jax.lax.complex(jnp.sum(ar * br + ai * bi), jnp.sum(ar * bi - ai * br))


def _norm(a: jax.Array) -> jax.Array:
    return jnp.sqrt(
        jnp.sum(a.real.astype(jnp.float64) ** 2 + a.imag.astype(jnp.float64) ** 2)
    )


def lanczos_herm(
    matvec: Callable,
    v0: jax.Array,
    steps: int,
    reorth: bool = True,
) -> tuple[np.ndarray, np.ndarray, jax.Array]:
    """`steps` Lanczos iterations on hermitian A from start vector v0.

    Returns (alphas [m], betas [m-1], basis V [m, *shape]) with m <= steps
    (early exit on breakdown).  Full reorthogonalization against the whole
    basis when `reorth` (always use it below f64 — f32 Lanczos without
    reorth produces ghost copies of converged Ritz values).
    """
    v = v0 / _norm(v0).astype(v0.real.dtype)
    basis = [v]
    alphas: list[float] = []
    betas: list[float] = []
    mv = jax.jit(matvec)
    prev = None
    beta_prev = 0.0
    for _ in range(steps):
        w = mv(v)
        alpha = _dot(v, w).real
        alphas.append(float(alpha))
        w = w - alpha.astype(w.real.dtype) * v
        if prev is not None:
            w = w - jnp.asarray(beta_prev, w.real.dtype) * prev
        if reorth:
            # two passes of classical Gram-Schmidt ("twice is enough")
            for _pass in range(2):
                for b in basis:
                    w = w - _dot(b, w).astype(w.dtype) * b
        beta = float(_norm(w))
        if beta < 1e-12 * (abs(alphas[0]) + 1.0):
            break  # invariant subspace found
        betas.append(beta)
        prev, beta_prev = v, beta
        v = (w / jnp.asarray(beta, w.real.dtype)).astype(v0.dtype)
        basis.append(v)
    m = len(alphas)
    return (
        np.asarray(alphas, np.float64),
        np.asarray(betas[: m - 1], np.float64),
        jnp.stack(basis[:m]),
    )


def lowest_eigenpairs(
    matvec: Callable,
    v0: jax.Array,
    n_ev: int,
    steps: int | None = None,
    by_magnitude: bool = False,
) -> RitzPairs:
    """The n_ev lowest Ritz pairs of hermitian A (lowest |theta| when
    `by_magnitude` — the overlap kernel Q_W is indefinite and the sign
    function deflates the smallest-MAGNITUDE modes).

    Reference behavior: eigenvalues.c computing `No_eigenvalues` low modes
    before Dov_psi applications.  steps defaults to max(4 n_ev, 40).
    """
    if steps is None:
        steps = max(4 * n_ev, 40)
    alphas, betas, basis = lanczos_herm(matvec, v0, steps)
    if betas.size:
        theta, s = np.linalg.eigh(
            np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
        )
    else:
        theta, s = alphas.copy(), np.eye(1)
    order = np.argsort(np.abs(theta)) if by_magnitude else np.argsort(theta)
    take = order[:n_ev]
    # Ritz vectors: y_i = sum_j s[j, i] v_j  (small k x m contraction)
    coeff = jnp.asarray(s[:, take].T, basis.dtype)  # [n_ev, m]
    vecs = jnp.tensordot(coeff, basis, axes=1)
    # normalize (f32 roundoff) and measure residuals
    mv = jax.jit(matvec)
    vals, res, out = [], [], []
    for i in range(len(take)):
        vi = vecs[i]
        vi = vi / _norm(vi).astype(vi.real.dtype)
        wi = mv(vi)
        th = float(_dot(vi, wi).real)
        ri = float(_norm(wi - jnp.asarray(th, wi.real.dtype) * vi))
        vals.append(th)
        res.append(ri)
        out.append(vi)
    return RitzPairs(np.asarray(vals), jnp.stack(out), np.asarray(res))
