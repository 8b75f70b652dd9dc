"""Chronological solver guess: extrapolate the initial guess from the
solutions of previous MD steps.

Reference: solver/chrono_guess.c `chrono_guess()` — each monomial keeps a
short history (`csg_field`) of past solutions; the new guess is the
least-squares-optimal combination minimizing |A x0 - b| over the span of the
history (the MDS extrapolation of Brower et al., hep-lat/9509012).

TPU shape: the history is a fixed-size stacked array [n, ...field] (static
shapes for jit); the small n x n normal-equation solve happens on-device in
f64.  An all-zero history column contributes nothing (guarded solve).
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


def _cdot(a, b):
    return jnp.sum(jnp.conj(a.astype(jnp.complex128)) * b.astype(jnp.complex128))


def chrono_guess(hist: ChronoHistory, matvec: Callable, b: jax.Array) -> jax.Array:
    """x0 = sum_i c_i v_i with c = argmin |A x0 - b|^2 (normal equations
    G c = r, G_ij = <A v_i, A v_j>, r_i = <A v_i, b>) — reference:
    chrono_guess() with the same least-squares construction."""
    n = hist.fields.shape[0]
    if n == 0:
        return jnp.zeros_like(b)
    av = jnp.stack([matvec(hist.fields[i]) for i in range(n)])
    g = jnp.zeros((n, n), jnp.complex128)
    r = jnp.zeros((n,), jnp.complex128)
    for i in range(n):
        r = r.at[i].set(_cdot(av[i], b))
        for j in range(n):
            g = g.at[i, j].set(_cdot(av[i], av[j]))
    # mask out invalid history slots; regularize empty diagonal
    valid = (jnp.arange(n) < hist.count)
    gm = jnp.where(valid[:, None] & valid[None, :], g, 0.0)
    gm = gm + jnp.where(valid, 1e-30, 1.0) * jnp.eye(n, dtype=g.dtype)
    rm = jnp.where(valid, r, 0.0)
    c = jnp.linalg.solve(gm, rm)
    c = jnp.where(valid, c, 0.0).astype(b.dtype)
    return jnp.tensordot(c, hist.fields, axes=(0, 0))


def chrono_push(hist: ChronoHistory, x: jax.Array) -> ChronoHistory:
    """Insert the newest solution at slot 0 (reference: the csg ring)."""
    fields = jnp.roll(hist.fields, 1, axis=0).at[0].set(x)
    n = hist.fields.shape[0]
    return ChronoHistory(fields=fields, count=jnp.minimum(hist.count + 1, n))
