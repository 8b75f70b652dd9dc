"""Mixed-precision CG: outer defect-correction in high precision around an
inner reduced-precision CG, with reliable-update restarts.

Reference: solver/mixed_cg_her.c (outer f64 loop around f32 CG on `_32`
field copies) and solver/rg_mixed_cg_her.c (reliable-update variant);
survey §2.6 "Mixed-precision CG" and §2.11 "precision parallelism".

TPU mapping of the precision pair (survey §7 "Precision of DeltaH and CG"):
the natural pair is (high = complex64 fields + f64 scalar reductions,
low = a bfloat16-internal dslash) — the low matvec is supplied by the caller,
so the same driver serves CPU f64/f32 testing and TPU f32/bf16 production.

Algorithm: repeat { r = b - A_hi x ; solve A_lo d = r to delta with inner CG;
x += d } until |r|^2 <= tol^2 |b|^2.  Inner solves restart from zero — the
defect-correction form tolerates arbitrary error in A_lo (it only changes the
convergence rate, never the fixed point).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from tmlqcd_tpu.solvers.cg import cg

__all__ = ["mixed_cg", "MixedCGResult"]


class MixedCGResult(NamedTuple):
    x: jax.Array
    outer_iterations: jax.Array
    inner_iterations: jax.Array
    residual_sq: jax.Array


def _norm_sq(v):
    return jnp.sum(v.real.astype(jnp.float64) ** 2 + v.imag.astype(jnp.float64) ** 2)


def mixed_cg(
    matvec_hi: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    matvec_lo: Callable[[jax.Array], jax.Array] | None = None,
    lo_dtype=jnp.complex64,
    x0: jax.Array | None = None,
    tol: float = 1e-9,
    inner_tol: float = 1e-2,
    max_outer: int = 50,
    max_inner: int = 500,
    rel_prec: bool = True,
) -> MixedCGResult:
    """Solve A x = b (A hermitian positive) with inner solves in `lo_dtype`.

    If `matvec_lo` is None, the high matvec is reused with inputs cast to
    `lo_dtype` (precision then comes only from the dtype of the iterates —
    the reference's `_32` copies behave the same way).
    """
    if matvec_lo is None:
        matvec_lo = lambda v: matvec_hi(v.astype(b.dtype)).astype(lo_dtype)

    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_sq = _norm_sq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    def outer_cond(st):
        x, rs, k, inner = st
        return jnp.logical_and(rs > target, k < max_outer)

    def outer_body(st):
        x, rs, k, inner = st
        r = b - matvec_hi(x)
        d = cg(
            matvec_lo,
            r.astype(lo_dtype),
            tol=inner_tol,
            maxiter=max_inner,
            rel_prec=True,
        )
        x = x + d.x.astype(b.dtype)
        r_new = b - matvec_hi(x)
        return (x, _norm_sq(r_new), k + 1, inner + d.iterations)

    r0 = b - matvec_hi(x0)
    st = (x0, _norm_sq(r0), jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    x, rs, k, inner = jax.lax.while_loop(outer_cond, outer_body, st)
    return MixedCGResult(x=x, outer_iterations=k, inner_iterations=inner, residual_sq=rs)
