"""Gauge-covariant source and link smearing.

Reference: jacobi.c (Jacobi smearing of timeslice sources, survey 2.9
"Sources" row) and the APE-smeared spatial links such smeared sources are
conventionally built on.  Smearing improves ground-state overlap of the
interpolating fields used by the online/offline correlator measurements.

Definitions (standard ETMC conventions, documented here because the exact
normalization differs between codes):

  Jacobi:  psi' = (1 + 6 kappa)^{-1} [ psi + kappa * H psi ],  iterated N times
           H psi(x) = sum_{i=1..3} U_i(x) psi(x+i) + U_i(x-i)^dag psi(x-i)

  APE:     U_i' = P_SU3[ (1 - alpha) U_i + (alpha/4) * sum_{j spatial != i}
                         (up + down staples) ],  spatial links only,
           temporal links untouched.  P_SU3 is the covariant polar
           projection (su3.project_su3_polar) — Gram-Schmidt would break
           gauge covariance.

Both are purely spatial: a source supported on one timeslice stays on that
timeslice, and with unit links a spatially constant timeslice source is an
exact fixed point of the Jacobi iteration (eigenvalue (1+6k)/(1+6k) = 1) —
used as the known-answer test.

All maps are gauge covariant: smear(g.psi, g.U) = g.smear(psi, U) — the
property tests/test_smearing.py checks, since it pins every index and
adjoint in the formulas above.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tmlqcd_tpu import su3
from tmlqcd_tpu.lattice import Lattice, shift_full

__all__ = ["jacobi_smear", "ape_smear_spatial", "stout_smear"]


def _cov_fwd(u_i: jax.Array, psi: jax.Array, i: int, lat: Lattice) -> jax.Array:
    """U_i(x) psi(x+i) for spinor psi [4, 3, T, X, M]."""
    nbr = shift_full(psi, i, +1, lat)
    return jnp.stack([su3.matvec(u_i, nbr[s]) for s in range(4)])


def _cov_bwd(u_i: jax.Array, psi: jax.Array, i: int, lat: Lattice) -> jax.Array:
    """U_i(x-i)^dag psi(x-i)."""
    ud = su3.adj(shift_full(u_i, i, -1, lat))
    nbr = shift_full(psi, i, -1, lat)
    return jnp.stack([su3.matvec(ud, nbr[s]) for s in range(4)])


def jacobi_smear(
    psi: jax.Array, u: jax.Array, lat: Lattice, kappa: float = 0.21, n_iter: int = 5
) -> jax.Array:
    """N Jacobi-smearing sweeps of a full-lattice spinor [4, 3, T, X, M]
    (reference: jacobi.c — the covariant 3D-Laplacian source smearing).

    The hop matrices H_i are time-diagonal, so timeslice sources remain
    timeslice sources; apply to the output of meas.sources before inverting.
    Typically paired with APE-smeared spatial links (ape_smear_spatial).
    """
    norm = jnp.asarray(1.0 / (1.0 + 6.0 * kappa), psi.real.dtype)
    k = jnp.asarray(kappa, psi.real.dtype)

    def sweep(p, _):
        h = jnp.zeros_like(p)
        for i in (1, 2, 3):
            u_i = u[:, :, i]
            h = h + _cov_fwd(u_i, p, i, lat) + _cov_bwd(u_i, p, i, lat)
        return norm * (p + k * h), None

    out, _ = jax.lax.scan(sweep, psi, None, length=n_iter)
    return out


def _staples(u: jax.Array, i: int, lat: Lattice, dirs) -> jax.Array:
    """Sum of staples around U_i over the planes (i, j), j in dirs\\{i}:
    up   = U_j(x) U_i(x+j) U_j(x+i)^dag
    down = U_j(x-j)^dag U_i(x-j) U_j(x-j+i)
    (so U_i(x) staple^dag closes the up/down plaquettes)."""
    u_i = u[:, :, i]
    acc = None
    for j in dirs:
        if j == i:
            continue
        u_j = u[:, :, j]
        up = su3.mul(
            su3.mul(u_j, shift_full(u_i, j, +1, lat)),
            su3.adj(shift_full(u_j, i, +1, lat)),
        )
        u_j_mj = shift_full(u_j, j, -1, lat)
        u_i_mj = shift_full(u_i, j, -1, lat)
        down = su3.mul(
            su3.mul(su3.adj(u_j_mj), u_i_mj),
            shift_full(u_j_mj, i, +1, lat),
        )
        s = up + down
        acc = s if acc is None else acc + s
    return acc


def ape_smear_spatial(
    u: jax.Array, lat: Lattice, alpha: float = 0.5, n_iter: int = 4
) -> jax.Array:
    """N APE sweeps of the spatial links (temporal links pass through):
    U_i -> P_SU3[(1-alpha) U_i + (alpha/4) * staple sum].  Gauge covariant;
    raises the spatial plaquette toward 1 (the smoothing the Jacobi kernel
    wants under it).  Input/output layout [3, 3, 4, T, X, M]."""
    a = jnp.asarray(alpha, u.real.dtype)

    def sweep(uc, _):
        new = [uc[:, :, 0]]
        for i in (1, 2, 3):
            st = _staples(uc, i, lat, (1, 2, 3))
            new.append(su3.project_su3_polar((1.0 - a) * uc[:, :, i] + (a / 4.0) * st))
        return jnp.stack(new, axis=2), None

    out, _ = jax.lax.scan(sweep, u, None, length=n_iter)
    return out


def stout_smear(
    u: jax.Array,
    lat: Lattice,
    rho: float = 0.1,
    n_iter: int = 1,
    spatial_only: bool = False,
) -> jax.Array:
    """N stout-smearing sweeps (Morningstar-Peardon; reference:
    stout_smear.c driven by the UseStoutSmearing/StoutRho/
    StoutNoIterations input keys):

        Omega_mu = rho * C_mu U_mu^dag   (C_mu = staple sum around U_mu)
        U_mu    -> exp(TA(Omega_mu)) U_mu

    with TA the traceless-antihermitian projection (su3.ta_project) — the
    exact SU(3)-preserving analytic smearing.  Unlike APE there is no
    reunitarization step, so the map is smooth in U and `jax.grad`
    differentiates through it exactly (the reference needs the hand-derived
    stout_force chain rule; here forces through smeared operators come for
    free from AD, exp included — expm_ta is the differentiable
    scaling-squaring exponential the MD drift already uses).

    `spatial_only=True` smears only the spatial links with spatial staples
    (the variant paired with temporal-direction observables); the default
    smears all four directions isotropically like the reference.
    """
    r = jnp.asarray(rho, u.real.dtype)
    dirs = (1, 2, 3) if spatial_only else (0, 1, 2, 3)

    def sweep(uc, _):
        new = []
        for mu in range(4):
            if spatial_only and mu == 0:
                new.append(uc[:, :, 0])
                continue
            c = _staples(uc, mu, lat, dirs)
            omega = su3.mul(r * c, su3.adj(uc[:, :, mu]))
            q = su3.ta_project(omega)
            new.append(su3.mul(su3.expm_ta(q), uc[:, :, mu]))
        return jnp.stack(new, axis=2), None

    out, _ = jax.lax.scan(sweep, u, None, length=n_iter)
    return out
