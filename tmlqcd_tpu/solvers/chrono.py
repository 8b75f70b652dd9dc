"""Chronological solver guess: extrapolate the initial guess from the
solutions of previous MD steps.

Reference: solver/chrono_guess.c `chrono_guess()` — each monomial keeps a
short history (`csg_field`) of past solutions; the new guess is the
least-squares-optimal combination minimizing |A x0 - b| over the span of the
history (the MDS extrapolation of Brower et al., hep-lat/9509012).

TPU shape: the history is a fixed-size stacked array [n, ...field] (static
shapes for jit); the small n x n normal-equation solve happens on-device in
f64.  The least squares runs over REAL coefficients (G_ij = Re<A v_i, A v_j>)
so the same code serves complex fields and the split-f32 re/im layout of the
Pallas fast path — MD solutions evolve continuously, so real combinations
capture the extrapolation (and f64 real linalg avoids complex128 emulation
on TPU).  An all-zero history contributes nothing (guarded solve).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ChronoHistory", "chrono_init", "chrono_guess", "chrono_push"]


class ChronoHistory(NamedTuple):
    fields: jax.Array  # [n, ...field] past solutions (most recent first)
    count: jax.Array  # i32 number of valid entries


def chrono_init(n: int, shape: tuple, dtype) -> ChronoHistory:
    """Empty history of capacity n (reference: init_csg_field)."""
    return ChronoHistory(
        fields=jnp.zeros((n,) + tuple(shape), dtype),
        count=jnp.asarray(0, jnp.int32),
    )


def _rdot(a, b):
    """Re<a, b> with f64 accumulation; works for complex and real (split)
    arrays alike — the real inner product of the underlying real vector
    space."""
    if jnp.iscomplexobj(a):
        return jnp.sum(
            a.real.astype(jnp.float64) * b.real.astype(jnp.float64)
            + a.imag.astype(jnp.float64) * b.imag.astype(jnp.float64)
        )
    return jnp.sum(a.astype(jnp.float64) * b.astype(jnp.float64))


def _solve_spd_small(g: jax.Array, r: jax.Array, n: int) -> jax.Array:
    """Unrolled Cholesky solve for the tiny (n<=4) SPD normal-equation
    system — written in elementary ops because TPU XLA has no f64
    LuDecomposition/Cholesky expansion; n is static so this fully unrolls."""
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = g[i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, 1e-300))
            else:
                l[i][j] = s / l[j][j]
    y = [None] * n
    for i in range(n):
        s = r[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    c = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * c[k]
        c[i] = s / l[i][i]
    return jnp.stack(c)


def chrono_guess(hist: ChronoHistory, matvec: Callable, b: jax.Array) -> jax.Array:
    """x0 = sum_i c_i v_i with real c = argmin |A x0 - b|^2 (normal equations
    G c = r, G_ij = Re<A v_i, A v_j>, r_i = Re<A v_i, b>) — reference:
    chrono_guess() with the same least-squares construction."""
    n = hist.fields.shape[0]
    if n == 0:
        return jnp.zeros_like(b)
    av = [matvec(hist.fields[i]) for i in range(n)]
    g = jnp.zeros((n, n), jnp.float64)
    r = jnp.zeros((n,), jnp.float64)
    for i in range(n):
        r = r.at[i].set(_rdot(av[i], b))
        for j in range(i, n):
            gij = _rdot(av[i], av[j])
            g = g.at[i, j].set(gij)
            g = g.at[j, i].set(gij)
    # mask out invalid history slots; regularize (consecutive MD solutions
    # are nearly collinear — the relative ridge keeps Cholesky stable)
    valid = jnp.arange(n) < hist.count
    gm = jnp.where(valid[:, None] & valid[None, :], g, 0.0)
    ridge = 1e-10 * jnp.trace(gm) / n + 1e-30
    gm = gm + (jnp.where(valid, ridge, 1.0)) * jnp.eye(n, dtype=g.dtype)
    rm = jnp.where(valid, r, 0.0)
    c = _solve_spd_small(gm, rm, n)
    c = jnp.where(valid, c, 0.0)
    if jnp.iscomplexobj(b):
        c = c.astype(b.real.dtype).astype(b.dtype)
    else:
        c = c.astype(b.dtype)
    return jnp.tensordot(c, hist.fields, axes=(0, 0))


def chrono_push(hist: ChronoHistory, x: jax.Array) -> ChronoHistory:
    """Insert the newest solution at slot 0 (reference: the csg ring)."""
    fields = jnp.roll(hist.fields, 1, axis=0).at[0].set(x)
    n = hist.fields.shape[0]
    return ChronoHistory(fields=fields, count=jnp.minimum(hist.count + 1, n))
