"""Overlap (Neuberger) fermion tests.

Oracles mirror the reference's test/overlaptests.c (`ov_check_*`): the
Ginsparg-Wilson relation, sign-function involution sign(Q)^2 = 1,
gamma5-hermiticity of D_ov, and solver residuals (SUMR vs CGNE cross-check).
SUMR itself is additionally validated against a dense numpy solve on a
random shifted-unitary system (no lattice structure — pure algorithm test).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.gamma import apply_gamma5
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops import overlap as ov
from tmlqcd_tpu.solvers.sumr import sumr

DT = jnp.complex128
LAT = Lattice((4, 4, 4, 4))
PARAMS = ov.OverlapParams(rho=1.0, m=0.3, degree=48, n_ev=4)


def _smooth_gauge(key, scale=0.3):
    """Weakly fluctuating gauge field: exp(scale * random algebra) — keeps
    the Wilson kernel gapped so moderate polynomial degrees suffice (the
    reference likewise tests overlap on smooth/small configs)."""
    p = su3.random_momenta(key, (4,) + LAT.site_shape, DT)
    return su3.expm_ta(jnp.asarray(scale, jnp.float64) * p)


@pytest.fixture(scope="module")
def setup():
    u = _smooth_gauge(jax.random.key(7))
    s = ov.make_overlap(u, PARAMS, LAT, key=jax.random.key(8))
    psi = rng.normal_spinor(jax.random.key(9), (4, 3) + LAT.site_shape, DT)
    phi = rng.normal_spinor(jax.random.key(10), (4, 3) + LAT.site_shape, DT)
    return s, psi, phi


def test_sign_involution(setup):
    """sign(Q)^2 psi == psi up to the Chebyshev accuracy."""
    s, psi, _ = setup
    s2 = ov.sign_q(s, ov.sign_q(s, psi))
    rel = float(jnp.linalg.norm(s2 - psi) / jnp.linalg.norm(psi))
    assert rel < 5.0 * (s.sign_err + s.ev_resid) + 1e-8, rel


def test_ginsparg_wilson_relation(setup):
    """{gamma5, D} = D gamma5 D / rho at m=0 (the defining property)."""
    s, psi, _ = setup
    defect = float(ov.gw_defect(s, psi))
    assert defect < 10.0 * (s.sign_err + s.ev_resid) + 1e-8, defect


def test_gamma5_hermiticity(setup):
    """D_ov^+ = gamma5 D_ov gamma5 holds EXACTLY (independent of the sign
    approximation quality — sign_q is hermitian by construction)."""
    s, psi, phi = setup
    lhs = jnp.vdot(phi, ov.dov_psi(s, psi))
    rhs = jnp.vdot(ov.dov_dagger_psi(s, phi), psi)
    assert abs(complex(lhs - rhs)) < 1e-9 * abs(complex(lhs))


def test_deflation_matches_undeflated(setup):
    """Deflated and undeflated sign functions agree (the low modes are
    treated exactly in one and polynomially in the other)."""
    s, psi, _ = setup
    p0 = dataclasses.replace(PARAMS, n_ev=0, degree=160)
    s0 = ov.make_overlap(s.u, p0, LAT, key=jax.random.key(8))
    a = ov.sign_q(s, psi)
    b = ov.sign_q(s0, psi)
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    assert rel < 10.0 * (s.sign_err + s0.sign_err + s.ev_resid) + 1e-8, rel


def test_invert_overlap_cgne(setup):
    s, _, phi = setup
    res = ov.invert_overlap(s, phi, tol=1e-8, maxiter=400, solver="cgne")
    r = ov.dov_psi(s, res.x) - phi
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(phi))
    # true-residual floor is the sign-function accuracy
    assert rel < 50.0 * max(s.sign_err + s.ev_resid, 1e-10), rel


def test_invert_overlap_sumr_matches_cgne(setup):
    s, _, phi = setup
    r1 = ov.invert_overlap(s, phi, tol=1e-8, maxiter=400, solver="sumr")
    r2 = ov.invert_overlap(s, phi, tol=1e-8, maxiter=400, solver="cgne")
    resid = ov.dov_psi(s, r1.x) - phi
    rel = float(jnp.linalg.norm(resid) / jnp.linalg.norm(phi))
    assert rel < 50.0 * max(s.sign_err + s.ev_resid, 1e-10), rel
    diff = float(jnp.linalg.norm(r1.x - r2.x) / jnp.linalg.norm(r2.x))
    assert diff < 1e-5, diff


def test_sumr_dense_unitary():
    """Pure-algorithm oracle: SUMR == dense solve for (zeta + rho U) x = b
    with a random unitary U (reference: solver/sumr.c contract)."""
    nprng = np.random.default_rng(0)
    n = 40
    a = nprng.normal(size=(n, n)) + 1j * nprng.normal(size=(n, n))
    u, _ = np.linalg.qr(a)
    b = nprng.normal(size=n) + 1j * nprng.normal(size=n)
    zeta, rho = 0.9, 0.6
    m = zeta * np.eye(n) + rho * u
    x_ref = np.linalg.solve(m, b)
    mv = lambda x: jnp.asarray(u, jnp.complex128) @ x
    res = sumr(mv, jnp.asarray(b, jnp.complex128), zeta=zeta, rho=rho,
               tol=1e-10, maxiter=2 * n)
    x = np.asarray(res.x)
    assert np.linalg.norm(m @ x - b) / np.linalg.norm(b) < 1e-9
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8


def test_lanczos_lowest_eigenpairs_dense():
    """Lanczos Ritz pairs match numpy eigh on a random hermitian matrix."""
    from tmlqcd_tpu.solvers.lanczos import lowest_eigenpairs

    nprng = np.random.default_rng(3)
    n = 60
    a = nprng.normal(size=(n, n)) + 1j * nprng.normal(size=(n, n))
    h = (a + a.conj().T) / 2.0
    mv = lambda x: jnp.asarray(h, jnp.complex128) @ x
    v0 = jnp.asarray(nprng.normal(size=n) + 1j * nprng.normal(size=n), jnp.complex128)
    out = lowest_eigenpairs(mv, v0, n_ev=4, steps=n)
    w = np.linalg.eigvalsh(h)
    np.testing.assert_allclose(out.values, w[:4], atol=1e-8)
    assert np.all(out.residuals < 1e-7)
