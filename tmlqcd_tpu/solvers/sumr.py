"""SUMR — minimal-residual solver for shifted unitary systems
(zeta I + rho U) x = b with U unitary.

Reference: solver/sumr.c (survey §2.6 "sumr (overlap)") — the overlap
operator D_ov = zeta + rho * (gamma5 sign(Q_W)) is a shifted unitary matrix,
and SUMR converges on it directly with ONE U application per iteration and
short recurrences (no restarts, no stored basis) — the structural advantage
over CGNE (two sign functions per iteration on the squared system).

Derivation implemented here (Jagels-Reichel-style, reconstructed from the
isometric-Arnoldi structure rather than transcribed):

* For unitary U the Arnoldi Hessenberg has orthonormal columns, so the
  Gram-Schmidt coefficients collapse to Gragg's coupled two-term recurrence
  with Schur parameters gamma_j = <w_j, U v_j>, sigma_j = sqrt(1-|gamma_j|^2):

      v_{j+1} = (U v_j - gamma_j w_j) / sigma_j
      w_{j+1} = (w_j - conj(gamma_j) U v_j) / sigma_j,   w_1 = v_1

  giving U v_j = gamma_j w_j + sigma_j v_{j+1} — the full Hessenberg column
  from two stored vectors.
* In the V-basis w_j has coordinates omega^(j) with the recurrence
  omega^(j) = sigma_{j-1} [omega^(j-1); 0] - conj(gamma_{j-1}) e_j, so every
  column of (zeta I~ + rho H~) above the diagonal is a scalar multiple of the
  previous column's top part.  After the running Givens QR this collapses the
  GMRES update to a three-scalar recurrence: phi_j (last component of the
  rotated omega), W_j (the accumulated direction combination), and the usual
  rotated rhs g — so the solution update x += eta_j m_j needs only
  m_{j-1} and W_j.  Memory: 5 field vectors, independent of iteration count.

All scalar arithmetic runs as (re, im) float64 pairs — complex128 is not
available on TPU even as an intermediate, while f64 scalar math is (slow but
negligible against the matvec).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["sumr", "SUMRResult"]


class SUMRResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_sq: jax.Array  # |b - (zeta + rho U) x|^2 estimate (f64)


# ----- complex scalars as (re, im) f64 pairs (TPU has no complex128) -------


def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _cconj(a):
    return (a[0], -a[1])


def _cabs2(a):
    return a[0] * a[0] + a[1] * a[1]


def _cdiv(a, b):
    d = _cabs2(b)
    return ((a[0] * b[0] + a[1] * b[1]) / d, (a[1] * b[0] - a[0] * b[1]) / d)


def _cscale(s, a):  # real s * complex a
    return (s * a[0], s * a[1])


def _cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _dot(a: jax.Array, b: jax.Array):
    """<a, b> (conjugate-linear in a) as an f64 pair."""
    ar, ai = a.real.astype(jnp.float64), a.imag.astype(jnp.float64)
    br, bi = b.real.astype(jnp.float64), b.imag.astype(jnp.float64)
    return (jnp.sum(ar * br + ai * bi), jnp.sum(ar * bi - ai * br))


def _norm_sq(a: jax.Array):
    return jnp.sum(a.real.astype(jnp.float64) ** 2 + a.imag.astype(jnp.float64) ** 2)


def _to_field(a, rdtype):
    return jax.lax.complex(a[0].astype(rdtype), a[1].astype(rdtype))


def sumr(
    matvec_u: Callable,
    b: jax.Array,
    zeta: float,
    rho: float,
    tol: float = 1e-8,
    maxiter: int = 500,
    rel_prec: bool = True,
) -> SUMRResult:
    """Solve (zeta + rho U) x = b, U unitary, via the short-recurrence
    minimal-residual method above.  `matvec_u` applies U only.

    zeta/rho may be Python floats (real shifts — the overlap mass case) —
    complex shifts work too as (re, im) tuples."""
    rdt = b.real.dtype
    z = zeta if isinstance(zeta, tuple) else (float(zeta), 0.0)
    r = rho if isinstance(rho, tuple) else (float(rho), 0.0)
    zt = (jnp.float64(z[0]), jnp.float64(z[1]))
    rh = (jnp.float64(r[0]), jnp.float64(r[1]))

    b_sq = _norm_sq(b)
    delta = jnp.sqrt(b_sq)
    target_sq = (tol * tol) * (b_sq if rel_prec else 1.0)

    zero = jnp.float64(0.0)
    one = jnp.float64(1.0)
    v1 = b / delta.astype(rdt)

    # carry: (j, x, v, w, m_prev, Wvec, phi, gam_p, sig_p, c_p, s_p, g, rn2)
    state0 = (
        jnp.int32(0),
        jnp.zeros_like(b),
        v1,
        v1,  # w_1 = v_1
        jnp.zeros_like(b),  # m_0
        jnp.zeros_like(b),  # W_0 (accumulated as part of iteration j)
        (zero, zero),  # phi_0 (unused; phi_1 is forced by gamma_0 = -1)
        (-one, zero),  # gamma_0 = -1  => phi_1 = 1
        zero,  # sigma_0 = 0
        one,  # c_0 = 1
        (zero, zero),  # s_0 = 0
        (delta, zero),  # g_1 = |b|
        b_sq,  # current |residual|^2
    )

    def cond(st):
        j, *_, rn2 = st
        return jnp.logical_and(j < maxiter, rn2 > target_sq)

    def body(st):
        (j, x, v, w, m_prev, Wvec, phi_p, gam_p, sig_p, c_p, s_p, g, _rn2) = st
        t = matvec_u(v)  # U v_j — the one matvec
        gam = _dot(w, t)
        sig = jnp.sqrt(jnp.maximum(one - _cabs2(gam), zero))
        inv_sig = jnp.where(sig > 1e-14, one / sig, zero)
        v_next = (t - _to_field(gam, rdt) * w) * inv_sig.astype(rdt)
        w_next = (w - _to_field(_cconj(gam), rdt) * t) * inv_sig.astype(rdt)

        # phi_j = -sigma_{j-1} conj(s_{j-1}) phi_{j-1} - conj(gamma_{j-1}) c_{j-1}
        phi = _cadd(
            _cscale(-sig_p, _cmul(_cconj(s_p), phi_p)),
            _cscale(-c_p, _cconj(gam_p)),
        )
        # W_j = sigma_{j-1} W_{j-1}
        #       + (sigma_{j-1} c_{j-1} phi_{j-1} - conj(gamma_{j-1}) s_{j-1}) m_{j-1}
        wcoef = _cadd(
            _cscale(sig_p * c_p, phi_p),
            _cmul(_cscale(-one, _cconj(gam_p)), s_p),
        )
        Wv = Wvec * sig_p.astype(rdt) + _to_field(wcoef, rdt) * m_prev

        # u_j = zeta s_{j-1} m_{j-1} + rho gamma_j W_j
        u_vec = _to_field(_cmul(zt, s_p), rdt) * m_prev + _to_field(_cmul(rh, gam), rdt) * Wv

        # pre-rotation diagonal and subdiagonal
        dtil = _cadd(_cscale(c_p, zt), _cmul(_cmul(rh, gam), phi))
        sub = jnp.sqrt(_cabs2(rh)) * sig  # |rho| sigma_j  (real >= 0)
        # Givens zeroing (dtil, sub) with c_j real, sub real >= 0:
        #   c = |dtil|/rr, s = (dtil/|dtil|) sub/rr, R_jj = (dtil/|dtil|) rr
        # (dtil == 0: phase -> 1, c = 0, s = 1, R_jj = sub).
        ad = jnp.sqrt(_cabs2(dtil))
        rr = jnp.sqrt(_cabs2(dtil) + sub * sub)
        safe_rr = jnp.where(rr > 0, rr, one)
        c_j = ad / safe_rr
        ph_d = _cscale(jnp.where(ad > 0, one / jnp.where(ad > 0, ad, one), zero), dtil)
        ph_d = (jnp.where(ad > 0, ph_d[0], one), jnp.where(ad > 0, ph_d[1], zero))
        s_j = _cscale(sub / safe_rr, ph_d)
        R_jj = _cscale(jnp.where(rr > 0, rr, one), ph_d)

        m_j = (v - u_vec) * _to_field(_cdiv((one, zero), R_jj), rdt)
        eta = _cscale(c_j, g)
        x = x + _to_field(eta, rdt) * m_j
        g_next = _cmul(_cscale(-one, _cconj(s_j)), g)
        rn2 = _cabs2(g_next)

        return (j + 1, x, v_next, w_next, m_j, Wv, phi, gam, sig, c_j, s_j, g_next, rn2)

    out = jax.lax.while_loop(cond, body, state0)
    return SUMRResult(x=out[1], iterations=out[0], residual_sq=out[-1])
