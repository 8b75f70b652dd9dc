"""Dirac operator property tests: the reference's algebraic oracles
(survey §4): gamma5-hermiticity, even/odd Schur consistency vs the full
operator, packed-vs-full dslash equality, free-field dispersion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.gamma import apply_gamma5
from tmlqcd_tpu.lattice import EVEN, ODD, Lattice, eo_pack, eo_unpack, pack_gauge_eo
from tmlqcd_tpu.ops import wilson as w

DT = jnp.complex128
LAT = Lattice((4, 4, 4, 6))
PARAMS = w.DiracParams(kappa=0.15, mu=0.03)


@pytest.fixture(scope="module")
def setup():
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, DT)
    ueo = pack_gauge_eo(u, LAT)
    ph = w.boundary_phases(PARAMS, LAT)
    psi = rng.normal_spinor(jax.random.key(1), (4, 3) + LAT.site_shape, DT)
    phi = rng.normal_spinor(jax.random.key(2), (4, 3) + LAT.site_shape, DT)
    return u, ueo, ph, psi, phi


def test_packed_dslash_matches_full(setup):
    u, ueo, ph, psi, _ = setup
    pe, po = eo_pack(psi, LAT)
    he_ref, ho_ref = eo_pack(w.dslash_full(u, psi, ph, LAT), LAT)
    he = w.dslash_packed(ueo, po, EVEN, LAT, ph)
    ho = w.dslash_packed(ueo, pe, ODD, LAT, ph)
    np.testing.assert_allclose(np.asarray(he), np.asarray(he_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ho), np.asarray(ho_ref), atol=1e-12)


def test_gamma5_hermiticity_full(setup):
    """<phi, D(mu) psi> == <g5 D(-mu) g5 phi, psi> — the master identity."""
    u, _, _, psi, phi = setup
    dp = w.d_full(u, psi, PARAMS, LAT)
    pm = w.DiracParams(kappa=PARAMS.kappa, mu=-PARAMS.mu)
    dm_phi = w.d_full(u, apply_gamma5(phi), pm, LAT)
    lhs = jnp.vdot(phi, dp)
    rhs = jnp.vdot(apply_gamma5(dm_phi), psi)
    assert abs(complex(lhs - rhs)) < 1e-10


def test_qhat_minus_is_adjoint_of_qhat_plus(setup):
    _, ueo, ph, psi, phi = setup
    pe, po = eo_pack(psi, LAT)
    fe, fo = eo_pack(phi, LAT)
    lhs = jnp.vdot(fo, w.q_hat(ueo, po, PARAMS, LAT, ph, +1.0))
    rhs = jnp.vdot(w.q_hat(ueo, fo, PARAMS, LAT, ph, -1.0), po)
    assert abs(complex(lhs - rhs)) < 1e-10


def test_qhat_pm_hermitian_positive(setup):
    _, ueo, ph, psi, phi = setup
    _, po = eo_pack(psi, LAT)
    _, fo = eo_pack(phi, LAT)
    qpm = lambda x: w.q_hat_pm(ueo, x, PARAMS, LAT, ph)
    a = jnp.vdot(po, qpm(po))
    assert abs(a.imag) < 1e-10 and a.real > 0
    herm = jnp.vdot(qpm(po), fo) - jnp.vdot(po, qpm(fo))
    assert abs(complex(herm)) < 1e-9


def test_schur_complement_identity(setup):
    """Mhat psi_o equals the odd block of M applied to
    [x_e = -Mee^{-1} M_eo psi_o ; psi_o] while the even block vanishes
    (reference: invert_eo.c reconstruction)."""
    u, ueo, ph, psi, _ = setup
    _, po = eo_pack(psi, LAT)
    he = w.dslash_packed(ueo, po, EVEN, LAT, ph)
    meo = -PARAMS.kappa * he
    xe = -w.mee_inv_packed(meo, PARAMS.mutld, +1.0)
    mfull = w.d_full(u, eo_unpack(xe, po, LAT), PARAMS, LAT)
    me, mo = eo_pack(mfull, LAT)
    mh = w.m_hat(ueo, po, PARAMS, LAT, ph, +1.0)
    assert np.abs(np.asarray(me)).max() < 1e-12
    np.testing.assert_allclose(np.asarray(mo), np.asarray(mh), atol=1e-12)


def test_mee_inv(setup):
    _, _, _, psi, _ = setup
    pe, _ = eo_pack(psi, LAT)
    out = w.mee_inv_packed(w.mee_packed(pe, PARAMS.mutld, +1.0), PARAMS.mutld, +1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pe), atol=1e-12)


def test_free_field_constant_mode():
    """Free field (U=1, periodic): on a constant spinor the hopping sums to
    2 per direction ((1-g)+(1+g)=2), so M psi = (1 + i mutld g5 - 8 kappa) psi
    with mutld = 0 here: M psi = (1 - 8 kappa) psi."""
    lat = Lattice((4, 4, 4, 4))
    params = w.DiracParams(kappa=0.11, mu=0.0, theta=(0.0, 0.0, 0.0, 0.0))
    u = jnp.broadcast_to(
        jnp.eye(3, dtype=DT).reshape(3, 3, 1, 1, 1, 1), (3, 3, 4) + lat.site_shape
    )
    psi = jnp.broadcast_to(
        rng.normal_spinor(jax.random.key(3), (4, 3), DT).reshape(4, 3, 1, 1, 1),
        (4, 3) + lat.site_shape,
    )
    out = w.d_full(u, psi, params, lat)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray((1.0 - 8.0 * params.kappa) * psi), atol=1e-12
    )
