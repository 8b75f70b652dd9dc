"""Fermionic known-answer tests: the FREE (U=1) Wilson twisted-mass operator
against its exact momentum-space form — all momenta, not just the constant
mode (VERDICT r4 missing #2).

Analytic form (tmLQCD 2-kappa normalization, survey Appendix A; boundary
phases ph_mu = exp(i pi theta_mu / L_mu) folded into the hopping):

    M(k) = (1 - 2 kappa sum_mu cos q_mu) + i mutld gamma5
           + 2 i kappa sum_mu gamma_mu sin q_mu,
    q_mu = 2 pi k_mu / L_mu + pi theta_mu / L_mu,

so with A = 1 - 2 kappa sum cos q and B_mu = 2 kappa sin q_mu,

    M(k)^{-1} = (A - i mutld gamma5 - i sum B_mu gamma_mu)
                / (A^2 + mutld^2 + sum B_mu^2)

(Clifford algebra: gamma_mu hermitian, {gamma_mu, gamma_nu} = 2 delta,
{gamma5, gamma_mu} = 0).  The position-space point-source propagator is the
inverse FFT of M(k)^{-1} — every momentum enters, so any operand-order,
phase, or gamma-convention error in the operator/inverter stack shows up
(the lesson of the round-4 plaquette bug: integrator-level invariants are
blind to such errors).

Reference: the free-field limit of operator/D_psi.c + invert_eo.c; the
correlator contraction of meas/correlators.c.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu.gamma import GAMMA, GAMMA5
from tmlqcd_tpu.inverter import invert_eo
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.meas.correlators import pion_correlator
from tmlqcd_tpu.meas.sources import point_source
from tmlqcd_tpu.ops import wilson as w

LAT = Lattice((8, 4, 4, 4))
PARAMS = w.DiracParams(kappa=0.11, mu=0.03)
DT = jnp.complex128  # exact-answer comparisons run in f64 on CPU


def _unit_gauge(dtype=DT):
    return jnp.broadcast_to(
        jnp.eye(3, dtype=dtype).reshape(3, 3, 1, 1, 1, 1),
        (3, 3, 4) + LAT.site_shape,
    )


def _momentum_grids():
    """q_mu [T,X,Y,Z] per direction (boundary-phase-shifted momenta) and the
    plain plane-wave momenta p_mu."""
    dims = LAT.dims
    ks = np.meshgrid(*[np.arange(L) for L in dims], indexing="ij")
    p = [2.0 * np.pi * ks[mu] / dims[mu] for mu in range(4)]
    q = [p[mu] + np.pi * PARAMS.theta[mu] / dims[mu] for mu in range(4)]
    return p, q


def _m_of_k():
    """M(k) [T,X,Y,Z,4,4] and its inverse, from the package's own GAMMA
    basis (the test pins the operator against the momentum algebra, not
    against a particular gamma representation)."""
    _, q = _momentum_grids()
    kappa, mutld = PARAMS.kappa, PARAMS.mutld
    a = 1.0 - 2.0 * kappa * sum(np.cos(q_mu) for q_mu in q)  # [T,X,Y,Z]
    eye = np.eye(4)
    m = a[..., None, None] * eye + 1j * mutld * GAMMA5
    denom = a**2 + mutld**2
    for mu in range(4):
        b_mu = 2.0 * kappa * np.sin(q[mu])
        m = m + 1j * b_mu[..., None, None] * GAMMA[mu]
        denom = denom + b_mu**2
    m_inv = (
        a[..., None, None] * eye
        - 1j * mutld * GAMMA5
        - sum(
            1j * (2.0 * kappa * np.sin(q[mu]))[..., None, None] * GAMMA[mu]
            for mu in range(4)
        )
    ) / denom[..., None, None]
    return m, m_inv


def _to_txyz(psi):
    """[4,3,T,X,Mf] -> numpy [4,3,T,X,Y,Z] (m = y*Z + z, point_source
    convention)."""
    t, x, y, z = LAT.dims
    return np.asarray(psi).reshape(4, 3, t, x, y, z)


def test_operator_on_plane_waves_matches_momentum_form():
    """d_full(U=1) on plane waves e^{ipx} chi == M(k) chi for a spread of
    momenta with nonzero components in every direction."""
    u = _unit_gauge()
    m_k, _ = _m_of_k()
    t, x, y, z = LAT.dims
    p, _ = _momentum_grids()
    d_fn = jax.jit(lambda psi: w.d_full(u, psi, PARAMS, LAT))
    rng = np.random.default_rng(11)
    for k in [(0, 0, 0, 0), (1, 0, 0, 0), (0, 1, 2, 3), (5, 3, 1, 2), (4, 2, 2, 2)]:
        kt, kx, ky, kz = k
        grid = np.meshgrid(*[np.arange(L) for L in LAT.dims], indexing="ij")
        phase = np.exp(
            1j * 2.0 * np.pi * (
                grid[0] * kt / t + grid[1] * kx / x + grid[2] * ky / y + grid[3] * kz / z
            )
        )
        chi = rng.normal(size=(4, 3)) + 1j * rng.normal(size=(4, 3))
        psi = (chi[:, :, None, None, None, None] * phase).reshape(
            (4, 3) + LAT.site_shape
        )
        out = _to_txyz(d_fn(jnp.asarray(psi, DT)))
        mchi = m_k[kt, kx, ky, kz] @ chi  # [4,3]
        expect = mchi[:, :, None, None, None, None] * phase
        np.testing.assert_allclose(out, expect, atol=1e-12)


@pytest.fixture(scope="module")
def free_propagator_columns():
    """Numerical point-source propagator columns (4 spins, color 0) from the
    e/o-preconditioned inverter on the unit gauge field."""
    u = _unit_gauge()
    inv = jax.jit(
        lambda b: invert_eo(u, b, PARAMS, LAT, tol=1e-12, maxiter=2000).x
    )
    cols = []
    for s0 in range(4):
        b = point_source(LAT, s0, 0, (0, 0, 0, 0), DT)
        cols.append(inv(b))
    return cols


def test_point_propagator_matches_analytic_all_momenta(free_propagator_columns):
    """invert_eo's point-source propagator == IFFT of M(k)^{-1}, every site,
    every spin pair (the all-momenta criterion)."""
    _, m_inv = _m_of_k()
    # S(x) = (1/V) sum_k e^{+i p x} M(k)^{-1}: numpy ifftn over the 4
    # momentum axes IS this sum including the 1/V
    s_x = np.fft.ifftn(m_inv, axes=(0, 1, 2, 3))  # [T,X,Y,Z,4,4]
    for s0, col in enumerate(free_propagator_columns):
        num = _to_txyz(col)  # [4,3,T,X,Y,Z]
        expect = np.moveaxis(s_x[..., s0], -1, 0)  # [4,T,X,Y,Z]
        np.testing.assert_allclose(num[:, 0], expect, atol=5e-11)
        # color off-diagonal exactly zero (free field is color-diagonal)
        np.testing.assert_allclose(num[:, 1:], 0.0, atol=5e-11)


def test_free_pion_correlator_time_dependence(free_propagator_columns):
    """C_PP(t) from the package's contraction on the numerical propagator ==
    the analytic free correlator sum_x,s,s' |S_spin(x)|^2 at EVERY t — the
    exact time-dependence, not just a mass fit (free-field pion check of
    the onlinemeas contraction, reference meas/correlators.c)."""
    _, m_inv = _m_of_k()
    s_x = np.fft.ifftn(m_inv, axes=(0, 1, 2, 3))
    c_analytic = np.sum(np.abs(s_x) ** 2, axis=(1, 2, 3, 4, 5))  # [T]
    c_num = np.zeros(LAT.dims[0])
    for col in free_propagator_columns:
        c_num = c_num + np.asarray(pion_correlator(col, LAT, 0))
    np.testing.assert_allclose(c_num, c_analytic, rtol=1e-9)
    # and the correlator decays away from the source and is time-symmetric
    # (antiperiodic BCs enter via q_mu, the correlator itself is periodic)
    assert c_num[1] < c_num[0]
    np.testing.assert_allclose(c_num[1:], c_num[1:][::-1], rtol=1e-9)
