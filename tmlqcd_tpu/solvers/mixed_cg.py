"""Mixed-precision CG, two variants:

* `mixed_cg` — outer defect-correction in high precision around an inner
  reduced-precision CG restarting from zero (reference:
  solver/mixed_cg_her.c, outer f64 loop around f32 CG on `_32` copies).
* `rg_mixed_cg` — reliable-update mixed CG: ONE low-precision CG iteration
  stream whose accumulated correction is periodically folded into the
  high-precision iterate with a true-residual replacement, retaining the
  search direction across replacements (reference: solver/rg_mixed_cg_her.c;
  survey §2.6 "Mixed-precision CG" and §2.11 "precision parallelism").
  Converges where plain defect correction stalls: the inner Krylov space is
  never discarded, and the residual never drifts away from the true one by
  more than one replacement interval.

TPU mapping of the precision pair (survey §7 "Precision of DeltaH and CG"):
the natural pair is (high = complex64 fields + f64 scalar reductions,
low = a bfloat16-internal dslash) — the low matvec is supplied by the caller,
so the same driver serves CPU f64/f32 testing and TPU f32/bf16 production.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from tmlqcd_tpu.solvers.cg import cg

__all__ = ["mixed_cg", "rg_mixed_cg", "MixedCGResult"]


class MixedCGResult(NamedTuple):
    x: jax.Array
    outer_iterations: jax.Array
    inner_iterations: jax.Array
    residual_sq: jax.Array


def _norm_sq(v):
    if jnp.iscomplexobj(v):
        return jnp.sum(
            v.real.astype(jnp.float64) ** 2 + v.imag.astype(jnp.float64) ** 2
        )
    return jnp.sum(v.astype(jnp.float64) ** 2)


def _dot_re(a, b):
    if jnp.iscomplexobj(a):
        return jnp.sum(
            a.real.astype(jnp.float64) * b.real.astype(jnp.float64)
            + a.imag.astype(jnp.float64) * b.imag.astype(jnp.float64)
        )
    return jnp.sum(a.astype(jnp.float64) * b.astype(jnp.float64))


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
    """Defect-correction mixed CG: repeat { r = b - A_hi x; solve
    A_lo d = r with an inner CG from zero; x += d } until |r|^2 <= target.
    Inner restarts discard the Krylov space — robust but see `rg_mixed_cg`
    for the variant that keeps it.

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


def rg_mixed_cg(
    matvec_hi: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    matvec_lo: Callable[[jax.Array], jax.Array] | None = None,
    lo_dtype=jnp.complex64,
    x0: jax.Array | None = None,
    tol: float = 1e-9,
    delta: float = 0.01,
    maxiter: int = 2000,
    rel_prec: bool = True,
) -> MixedCGResult:
    """Reliable-update mixed CG (reference: solver/rg_mixed_cg_her.c).

    One CG iteration stream runs entirely in low precision on the defect
    system A d = r.  Whenever the low-precision residual has shrunk by
    `delta` (in |r|^2) relative to the last replacement, the accumulated
    correction d is folded into the high-precision iterate, the TRUE
    residual r = b - A_hi x is recomputed, and iteration continues with the
    replaced residual but the RETAINED search direction p (groupwise
    restart) — so the Krylov space survives the replacement and the
    iterated residual can never drift more than one group away from truth.
    """
    if matvec_lo is None:
        matvec_lo = lambda v: matvec_hi(v.astype(b.dtype)).astype(lo_dtype)

    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_sq = _norm_sq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    r0 = b - matvec_hi(x0)
    rs0 = _norm_sq(r0)
    r_lo0 = r0.astype(lo_dtype)
    d0 = jnp.zeros_like(r_lo0)

    # state: (x_hi, d_lo, r_lo, p_lo, rs, rs_repl, k, n_repl)
    st0 = (
        x0,
        d0,
        r_lo0,
        r_lo0,
        rs0,
        rs0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )

    def cond(st):
        _, _, _, _, rs, _, k, _ = st
        return jnp.logical_and(rs > target, k < maxiter)

    def body(st):
        x, d, r_lo, p, rs, rs_repl, k, n_repl = st
        ap = matvec_lo(p)
        pap = _dot_re(p, ap)
        alpha = (rs / pap).astype(jnp.float64)
        a_lo = alpha.astype(p.real.dtype if jnp.iscomplexobj(p) else p.dtype)
        d = d + a_lo * p
        r_lo = r_lo - a_lo * ap
        rs_new = _norm_sq(r_lo)
        beta = (rs_new / rs).astype(p.real.dtype if jnp.iscomplexobj(p) else p.dtype)

        def replace(_):
            x_new = x + d.astype(b.dtype)
            r_true = b - matvec_hi(x_new)
            rs_true = _norm_sq(r_true)
            return (
                x_new,
                jnp.zeros_like(d),
                r_true.astype(lo_dtype),
                rs_true,
                rs_true,
                n_repl + 1,
            )

        def keep(_):
            return (x, d, r_lo, rs_new, rs_repl, n_repl)

        do_repl = rs_new < jnp.asarray(delta, jnp.float64) * rs_repl
        x, d, r_lo, rs_out, rs_repl, n_repl = jax.lax.cond(do_repl, replace, keep, None)
        # groupwise restart: retain the search direction across replacement
        p = r_lo + beta * p
        return (x, d, r_lo, p, rs_out, rs_repl, k + 1, n_repl)

    x, d, _, _, _, _, k, n_repl = jax.lax.while_loop(cond, body, st0)
    x = x + d.astype(b.dtype)
    rs_final = _norm_sq(b - matvec_hi(x))
    return MixedCGResult(
        x=x, outer_iterations=n_repl, inner_iterations=k, residual_sq=rs_final
    )
