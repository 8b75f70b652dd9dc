"""Degenerate rational monomial (RAT) + accept/reject correction monomials
(RATCOR / NDRATCOR) tests.

Oracles (survey §4 style): exact-heatbath consistency S(phi) == |eta|^2
(RAT: first-order factorization in the hermitian Q = gamma5 Mhat; *COR:
binomial-series Z^{1/4} / Z^{-1/2} of Z = Q^2 R(Q^2)^2 ~ 1), force vs
finite differences, Z-near-identity, and config lowering of the new types.
Reference: monomial/rat_monomial.c, ratcor_monomial.c, ndratcor_monomial.c.
"""

import jax
import jax.numpy as jnp
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.hmc.monomials import eo_spinor_shape
from tmlqcd_tpu.hmc.rational_monomials import (
    NDRatCorMonomial,
    RatCorMonomial,
    RatMonomial,
    _apply_z,
)
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops import ndoublet as nd
from tmlqcd_tpu.ops.wilson import DiracParams

LAT = Lattice((4, 4, 4, 4))
PARAMS = DiracParams(kappa=0.16, mu=0.0)


def _u0(key=11, dt=jnp.complex128):
    return su3.random_su3(jax.random.key(key), (4,) + LAT.site_shape, dt)


def _rat(**kw):
    kw.setdefault("acc_tol", 1e-11)
    kw.setdefault("force_tol", 1e-11)
    return RatMonomial(
        lat=LAT, params=PARAMS, order=8, s_min=5e-3, s_max=4.0, maxiter=3000, **kw
    )


def test_rat_requires_untwisted():
    with pytest.raises(ValueError):
        RatMonomial(lat=LAT, params=DiracParams(kappa=0.16, mu=0.05))


def test_rat_heatbath_action_consistency():
    """B^+B = R^{-1}(Q^2) exactly => S(B eta) = |eta|^2 to solver precision
    (NOT just to the rational error — the factorization is exact)."""
    u = _u0()
    mono = _rat()
    phi, s0 = mono.heatbath(u, jax.random.key(5))
    s = mono.action(u, phi)
    assert abs(float(s - s0)) / float(s0) < 1e-8


def test_rat_force_vs_finite_difference():
    u = _u0()
    mono = _rat()
    phi, _ = mono.heatbath(u, jax.random.key(6))
    f = mono.force(u, phi)
    p = su3.random_momenta(jax.random.key(8), (4,) + LAT.site_shape, u.dtype)
    eps = 1e-5
    sp = mono.action(su3.mul(su3.expm_ta(eps * p), u), phi)
    sm = mono.action(su3.mul(su3.expm_ta(-eps * p), u), phi)
    fd = (sp - sm) / (2 * eps)
    pred = jnp.sum(jnp.einsum("ij...,ji...->...", f, p)).real
    assert abs(float(fd - pred)) / abs(float(fd)) < 1e-6


def test_cloverrat_fast_force_matches_jnp(monkeypatch):
    """Degenerate CLOVERRAT MD force: the kernel-VJP hybrid surrogate
    (hoppings on the Pallas custom VJP, clover blocks via jnp AD —
    q_hat_clover_diff) == full jnp AD of the clover operator, mirroring the
    ND test in test_clover_nd.py."""
    u = su3.random_su3(jax.random.key(13), (4,) + LAT.site_shape, jnp.complex64)
    mono = RatMonomial(
        lat=LAT,
        params=DiracParams(kappa=0.15, mu=0.0, c_sw=1.3),
        order=4,
        s_min=5e-3,
        s_max=6.0,
        acc_tol=1e-7,
        force_tol=1e-7,
        maxiter=1500,
    )
    phi, _ = mono.heatbath(u, jax.random.key(14))
    monkeypatch.delenv("TMLQCD_TPU_FAST_SOLVES", raising=False)
    f_jnp = mono.force(u, phi)
    monkeypatch.setenv("TMLQCD_TPU_FAST_SOLVES", "1")
    f_fast = mono.force(u, phi)
    scale = float(jnp.max(jnp.abs(f_jnp)))
    err = float(jnp.max(jnp.abs(f_fast - f_jnp))) / scale
    assert err < 2e-3, (err, scale)


def _cor(**kw):
    kw.setdefault("acc_tol", 1e-11)
    return RatCorMonomial(
        lat=LAT,
        params=PARAMS,
        order=6,
        s_min=5e-3,
        s_max=4.0,
        maxiter=3000,
        n_terms=2,
        **kw,
    )


def test_ratcor_z_near_identity_and_heatbath():
    """Z = Q^2 R(Q^2)^2 deviates from 1 only by the rational error, and the
    correction heatbath is exact: S(Z^{1/4} eta) = eta^+ Z^{1/4-1/2+1/4} eta
    = |eta|^2 up to the series truncation O(delta^{n_terms+1})."""
    u = _u0()
    mono = _cor()
    v = rng.normal_spinor(jax.random.key(3), eo_spinor_shape(LAT), u.dtype)
    zv, _ = _apply_z(mono, u, v, 1e-11)
    dev = float(jnp.linalg.norm((zv - v).ravel()) / jnp.linalg.norm(v.ravel()))
    assert 1e-9 < dev < 1e-3  # small but nonzero: order-6 rational error
    phi, s0 = mono.heatbath(u, jax.random.key(4))
    s1 = mono.action(u, phi)
    assert abs(float(s1 - s0)) / float(s0) < 1e-9
    # accept/reject-only monomial: zero MD force by design
    assert float(jnp.max(jnp.abs(mono.force(u, phi)))) == 0.0


def test_ndratcor_heatbath():
    u = _u0()
    mono = NDRatCorMonomial(
        lat=LAT,
        params=nd.NDParams(kappa=0.15, mubar=0.1, epsbar=0.04),
        order=6,
        s_min=5e-3,
        s_max=4.0,
        acc_tol=1e-11,
        maxiter=3000,
        n_terms=2,
    )
    phi, s0 = mono.heatbath(u, jax.random.key(9))
    s1 = mono.action(u, phi)
    assert abs(float(s1 - s0)) / float(s0) < 1e-9


def test_config_builds_rational_types():
    from tmlqcd_tpu.config import MonomialSpec, build_monomial
    from tmlqcd_tpu.hmc import NDRatMonomial

    lat = LAT
    mk = lambda ty, **kw: build_monomial(
        MonomialSpec(type=ty, kappa=0.16, rat_order=8, **kw), lat, 3.3, 0.0
    )
    assert isinstance(mk("RAT"), RatMonomial)
    assert isinstance(mk("RATCOR"), RatCorMonomial)
    m = mk("CLOVERRAT", csw=1.57)
    assert isinstance(m, RatMonomial) and m.params.c_sw == 1.57
    assert isinstance(mk("NDRATCOR", two_kappa_mubar=0.04), NDRatCorMonomial)
    m = mk("NDCLOVERRAT", two_kappa_mubar=0.04, csw=1.57)
    assert isinstance(m, NDRatMonomial) and m.params.c_sw == 1.57
