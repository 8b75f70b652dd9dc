"""PHMC (polynomial) + reweighting tests (reference: ndpoly_monomial.c,
chebyshev_polynomial_nd.c, reweighting_factor.c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import su3
from tmlqcd_tpu.hmc.poly_monomials import NDPolyMonomial
from tmlqcd_tpu.hmc.reweight import mu_shift_reweighting
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops import ndoublet as nd
from tmlqcd_tpu.ops.wilson import DiracParams
from tmlqcd_tpu.solvers.chebyshev import chebyshev_apply, chebyshev_coeffs, chebyshev_eval

LAT = Lattice((4, 4, 4, 4))
PARAMS = nd.NDParams(kappa=0.15, mubar=0.15, epsbar=0.05)


def test_chebyshev_scalar_accuracy():
    # rate ~ exp(-deg / sqrt(cond)): cond=400 -> deg 80 reaches ~5e-5
    c = chebyshev_coeffs(lambda x: x**-0.25, 80, 1e-2, 4.0)
    xs = np.geomspace(1e-2, 4.0, 2001)
    err = np.max(np.abs(chebyshev_eval(c, xs, 1e-2, 4.0) * xs**0.25 - 1.0))
    assert err < 1e-4, err
    c = chebyshev_coeffs(lambda x: x**-0.25, 200, 1e-2, 4.0)
    err = np.max(np.abs(chebyshev_eval(c, xs, 1e-2, 4.0) * xs**0.25 - 1.0))
    assert err < 1e-9, err


def test_chebyshev_matrix_apply_matches_eig():
    """Apply to a small random hermitian positive matrix; compare against
    the eigen-decomposition evaluation."""
    rs = np.random.default_rng(0)
    a = rs.normal(size=(12, 12)) + 1j * rs.normal(size=(12, 12))
    h = a @ a.conj().T / 24 + 0.05 * np.eye(12)
    w_, v_ = np.linalg.eigh(h)
    lo, hi = 0.5 * w_.min(), 2.0 * w_.max()
    c = chebyshev_coeffs(lambda x: x**-0.25, 40, lo, hi)
    x = rs.normal(size=(12,)) + 1j * rs.normal(size=(12,))
    # oracle: the SAME polynomial evaluated in the eigenbasis (tests the
    # Clenshaw matrix recursion, not the approximation quality)
    ref = v_ @ (chebyshev_eval(c, w_, lo, hi) * (v_.conj().T @ x))
    out = chebyshev_apply(
        lambda u: jnp.asarray(h) @ u, c, jnp.asarray(x), lo, hi, remat=False
    )
    assert float(jnp.max(jnp.abs(out - jnp.asarray(ref)))) < 1e-10


def _u0(dt=jnp.complex128):
    return su3.random_su3(jax.random.key(7), (4,) + LAT.site_shape, dt)


def _mono():
    # the polynomial DEFINES the sampled action, so heatbath/action/force
    # identities are exact for ANY interval/degree; a modest degree keeps
    # the CPU test fast (approximation quality is tested separately above)
    return NDPolyMonomial(
        lat=LAT, params=PARAMS, degree=16, s_min=0.05, s_max=6.0,
        heatbath_tol=1e-12, maxiter=2000,
    )


@pytest.mark.slow
def test_ndpoly_heatbath_action_consistency():
    u = _u0()
    mono = _mono()
    assert mono.max_rel_err < 5e-2
    phi, s0 = mono.heatbath(u, jax.random.key(1))
    s = mono.action(u, phi)
    assert abs(float(s - s0)) / float(s0) < 1e-8  # exact up to CG tol


@pytest.mark.slow
def test_ndpoly_force_vs_finite_difference():
    u = _u0()
    mono = _mono()
    phi, _ = mono.heatbath(u, jax.random.key(2))
    f = mono.force(u, phi)
    p = su3.random_momenta(jax.random.key(3), (4,) + LAT.site_shape, u.dtype)
    eps = 1e-5
    sp = mono.action(su3.mul(su3.expm_ta(eps * p), u), phi)
    sm = mono.action(su3.mul(su3.expm_ta(-eps * p), u), phi)
    fd = (sp - sm) / (2 * eps)
    pred = jnp.sum(jnp.einsum("ij...,ji...->...", f, p)).real
    assert abs(float(fd - pred)) / abs(float(fd)) < 1e-6


def test_mu_shift_reweighting_identity():
    """Same parameters -> M = 1 -> all samples exactly 0."""
    u = su3.random_su3(jax.random.key(9), (4,) + LAT.site_shape, jnp.complex64)
    p = DiracParams(kappa=0.13, mu=0.05)
    s = mu_shift_reweighting(u, p, p, LAT, jax.random.key(10), n_samples=2, tol=1e-10)
    assert float(jnp.max(jnp.abs(s))) < 1e-4


def test_mu_shift_reweighting_direction():
    """Larger |mu| increases det(Q^2): log w = log det(new)/det(old) > 0
    for mu_new > mu_old, so samples should be systematically... negative
    exponents for det(M)^{-1} = w^{-1} < 1 -> s_i < 0 on average."""
    u = su3.random_su3(jax.random.key(11), (4,) + LAT.site_shape, jnp.complex64)
    p_old = DiracParams(kappa=0.13, mu=0.05)
    p_new = DiracParams(kappa=0.13, mu=0.10)
    s = mu_shift_reweighting(u, p_old, p_new, LAT, jax.random.key(12), n_samples=4, tol=1e-9)
    assert float(jnp.mean(s)) < 0.0


def test_ndpoly_fast_action_matches_jnp(monkeypatch):
    """PHMC polynomial application on the split/Pallas path (Clenshaw on
    split arrays, clover-ND via materialized blocks) == jnp path.  A random
    phi suffices — the identity under test is the operator application, so
    no (expensive) heatbath solve is needed."""
    from tmlqcd_tpu import rng

    u = _u0(jnp.complex64)
    phi = rng.normal_spinor(
        jax.random.key(4), (2, 4, 3) + LAT.eo_site_shape, jnp.complex64
    )
    for csw in (0.0, 1.2):
        params = nd.NDParams(
            kappa=PARAMS.kappa, mubar=PARAMS.mubar, epsbar=PARAMS.epsbar, c_sw=csw
        )
        mono = NDPolyMonomial(
            lat=LAT, params=params, degree=12, s_min=0.05, s_max=6.0,
        )
        monkeypatch.setenv("TMLQCD_TPU_FAST_SOLVES", "0")
        s_jnp = float(jax.jit(mono.action)(u, phi))
        monkeypatch.setenv("TMLQCD_TPU_FAST_SOLVES", "1")
        s_fast = float(jax.jit(mono.action)(u, phi))
        assert abs(s_fast - s_jnp) / abs(s_jnp) < 1e-4, (csw, s_fast, s_jnp)
