"""Non-degenerate doublet + rational (RHMC) monomial tests.

Oracles (survey §4 style — algebraic identities, no reference data needed):
gamma5-tau1 hermiticity of Q_nd, closed-form M_ee inverse, rational
approximation quality, exact-heatbath consistency S(phi) == |eta|^2, and
force vs finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.hmc.rational_monomials import NDRatMonomial
from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import ndoublet as nd
from tmlqcd_tpu.ops.wilson import boundary_phases
from tmlqcd_tpu.solvers.rational import rational_invsqrt

LAT = Lattice((4, 4, 4, 4))
PARAMS = nd.NDParams(kappa=0.15, mubar=0.12, epsbar=0.05)


def _u0(key=7, dt=jnp.complex128):
    return su3.random_su3(jax.random.key(key), (4,) + LAT.site_shape, dt)


def _chi(key, dt=jnp.complex128):
    return rng.normal_spinor(jax.random.key(key), (2, 4, 3) + LAT.eo_site_shape, dt)


def _cdot(a, b):
    return jnp.sum(jnp.conj(a) * b)


def test_rational_invsqrt_quality():
    r = rational_invsqrt(12, 1e-4, 4.0)
    assert r.max_rel_err < 1e-6
    # positivity needed by multishift CG + heatbath factorization
    assert np.all(r.sigma > 0) and np.all(r.rho > 0) and np.all(r.a_roots > 0)
    # interlacing: a_l between consecutive sigmas
    s = np.sort(r.sigma)
    a = np.sort(r.a_roots)
    assert np.all(a > s[:-1]) and np.all(a < s[1:])


def test_mee_nd_inverse():
    chi = _chi(1)
    for sign in (+1.0, -1.0):
        out = nd.mee_inv_nd(
            nd.mee_nd(chi, PARAMS.mubar_t, PARAMS.epsbar_t, sign),
            PARAMS.mubar_t,
            PARAMS.epsbar_t,
            sign,
        )
        assert float(jnp.max(jnp.abs(out - chi))) < 1e-13


def test_qnd_hermitian():
    u = _u0()
    ueo = pack_gauge_eo(u, LAT)
    ph = boundary_phases(PARAMS.wilson, LAT)
    c1, c2 = _chi(2), _chi(3)
    lhs = _cdot(c1, nd.q_nd(ueo, c2, PARAMS, LAT, ph))
    rhs = _cdot(nd.q_nd(ueo, c1, PARAMS, LAT, ph), c2)
    assert float(jnp.abs(lhs - rhs)) / float(jnp.abs(lhs)) < 1e-12


def _mono(**kw):
    kw.setdefault("acc_tol", 1e-12)
    kw.setdefault("force_tol", 1e-12)
    return NDRatMonomial(
        lat=LAT, params=PARAMS, order=12, s_min=5e-4, s_max=6.0, maxiter=3000, **kw
    )


def test_ndrat_heatbath_action_consistency():
    """phi = B eta with B^+B = R^{-1} gives S(phi) = |eta|^2 up to the
    rational error (<1e-6 relative) — the exactness contract of the
    reference's rat.nu heatbath."""
    u = _u0()
    mono = _mono()
    phi, s0 = mono.heatbath(u, jax.random.key(5))
    s = mono.action(u, phi)
    assert abs(float(s - s0)) / float(s0) < 1e-5


def test_ndrat_force_vs_finite_difference():
    u = _u0()
    mono = _mono()
    phi, _ = mono.heatbath(u, jax.random.key(6))
    f = mono.force(u, phi)
    p = su3.random_momenta(jax.random.key(8), (4,) + LAT.site_shape, u.dtype)
    eps = 1e-5
    sp = mono.action(su3.mul(su3.expm_ta(eps * p), u), phi)
    sm = mono.action(su3.mul(su3.expm_ta(-eps * p), u), phi)
    fd = (sp - sm) / (2 * eps)
    pred = jnp.sum(jnp.einsum("ij...,ji...->...", f, p)).real
    assert abs(float(fd - pred)) / abs(float(fd)) < 1e-6


def test_invert_doublet_eo_solves_full_operator():
    """M_nd x = b on the full lattice (reference: invert_doublet_eo.c)."""
    from tmlqcd_tpu.inverter import invert_doublet_eo
    from tmlqcd_tpu.ops.wilson import dslash_full

    u = _u0()
    b = rng.normal_spinor(jax.random.key(21), (2, 4, 3) + LAT.site_shape, jnp.complex128)
    res = invert_doublet_eo(u, b, PARAMS, LAT, tol=1e-10, maxiter=4000)
    x = res.x
    ph = boundary_phases(PARAMS.wilson, LAT)
    hop = jnp.stack([dslash_full(u, x[0], ph, LAT), dslash_full(u, x[1], ph, LAT)])
    mx = nd.mee_nd(x, PARAMS.mubar_t, PARAMS.epsbar_t, +1.0) - PARAMS.kappa * hop
    rel = float(jnp.linalg.norm(mx - b) / jnp.linalg.norm(b))
    assert rel < 1e-8, rel
