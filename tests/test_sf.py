"""Schrödinger functional tests (reference: sf_gauge_monomial.c,
sf_calc_action.c, sf_observables.c):

- classical abelian background action matches the closed form (only the
  temporal plaquettes contribute; constant per-color angles),
- AD dS/deta matches finite differences on a random gauge field,
- the coupling normalization k equals (6/beta) * dS_cl/deta at eta=0
  (the classical-limit definition g_bar^2 -> g0^2),
- the force vanishes identically on the Dirichlet-frozen dofs and matches
  the directional derivative on the dynamical ones,
- a masked-momenta HMC trajectory keeps the frozen slots bit-exactly fixed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu import su3
from tmlqcd_tpu.hmc import HMCConfig, IntegratorConfig, Level, hmc_trajectory
from tmlqcd_tpu.hmc.monomials import SFGaugeMonomial
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops import sf

LAT = Lattice((4, 4, 4, 4))
BETA = 6.0


def _u0(key=11, dt=jnp.complex128):
    return su3.random_su3(jax.random.key(key), (4,) + LAT.site_shape, dt)


def test_sf_classical_action_closed_form():
    eta = 0.3
    u = sf.sf_classical_background(LAT, eta, dtype=jnp.complex128)
    s = float(sf.sf_gauge_action(u, BETA, LAT, eta))
    # closed form: spatial plaquettes of the abelian background are exactly 1;
    # temporal plaquettes have constant angles theta_j = (phi'_j - phi_j)/(L T)
    t_ext, el = LAT.dims[0], LAT.dims[1]
    vs = LAT.dims[1] * LAT.mf
    phi, phi_p = map(np.asarray, sf.sf_phases(jnp.float64(eta)))
    theta = (phi_p - phi) / (el * t_ext)
    per_plaq = 1.0 - np.sum(np.cos(theta)) / 3.0
    s_cl = BETA * 3 * vs * t_ext * per_plaq  # ct=1: all T slabs weight 1
    assert abs(s - s_cl) / s_cl < 1e-12


def test_sf_dSdeta_matches_finite_difference():
    u = _u0()
    eta, eps = 0.2, 1e-4
    g = float(sf.sf_dS_deta(u, BETA, LAT, eta, nu=0.1, ct=0.9))
    sp = float(sf.sf_gauge_action(u, BETA, LAT, eta + eps, nu=0.1, ct=0.9))
    sm = float(sf.sf_gauge_action(u, BETA, LAT, eta - eps, nu=0.1, ct=0.9))
    fd = (sp - sm) / (2 * eps)
    assert abs(g - fd) / abs(fd) < 1e-7


def test_sf_coupling_normalization_classical_limit():
    # k is defined by g_bar^2 -> g0^2 = 6/beta classically:
    # k == (6/beta) * dS/deta at the classical solution, eta = 0.
    u = sf.sf_classical_background(LAT, 0.0, dtype=jnp.complex128)
    ds = float(sf.sf_dS_deta(u, BETA, LAT, 0.0))
    k = sf.sf_coupling_normalization(LAT)
    assert abs(k - 6.0 / BETA * ds) / k < 1e-10
    # published closed form at T = L, ct = 1
    el = LAT.dims[1]
    gamma = np.pi / (3.0 * el * LAT.dims[0])
    assert abs(k - 12.0 * el * el * (np.sin(2 * gamma) + np.sin(gamma))) < 1e-10


def test_sf_force_frozen_and_dynamical():
    u = _u0(key=3)
    mono = SFGaugeMonomial(lat=LAT, beta=BETA, eta=0.25)
    f = mono.force(u, None)
    # frozen dofs: spatial links at t=0 carry exactly zero force
    assert float(jnp.max(jnp.abs(f[:, :, 1:4, 0]))) == 0.0
    # dynamical dofs: directional derivative check with masked momenta
    p = su3.random_momenta(jax.random.key(9), (4,) + LAT.site_shape, u.dtype)
    p = p * sf.sf_momenta_mask(LAT)
    eps = 1e-5
    sp = mono.action(su3.mul(su3.expm_ta(eps * p), u), None)
    sm = mono.action(su3.mul(su3.expm_ta(-eps * p), u), None)
    fd = float((sp - sm) / (2 * eps))
    pred = float(jnp.sum(jnp.einsum("ij...,ji...->...", f, p)).real)
    assert abs(fd - pred) / abs(fd) < 1e-6


def test_sf_hmc_keeps_boundary_frozen():
    mono = SFGaugeMonomial(lat=LAT, beta=BETA, eta=0.1)
    cfg = HMCConfig(
        LAT,
        (mono,),
        IntegratorConfig(tau=1.0, levels=(Level("2mn", 12),)),
        momenta_mask=sf.sf_momenta_mask(LAT),
    )
    u = sf.sf_classical_background(LAT, 0.1).astype(jnp.complex64)
    frozen0 = np.asarray(u[:, :, 1:4, 0])
    step = jax.jit(functools.partial(hmc_trajectory, cfg))
    key = jax.random.key(0)
    for i in range(3):
        u, st = step(u, jax.random.fold_in(key, i))
        assert np.isfinite(float(st.delta_h))
    np.testing.assert_array_equal(np.asarray(u[:, :, 1:4, 0]), frozen0)
    assert abs(float(st.delta_h)) < 1.0  # sane MD energy violation


def test_sf_config_wiring():
    from tmlqcd_tpu.config_tmlqcd import parse_input
    from tmlqcd_tpu.config import build_hmc

    text = """
    L = 4
    T = 4
    beta = 6.0
    tau = 1.0
    NumberTimeScales = 1
    IntegrationSteps0 = 5

    BeginMonomial SFGAUGE
      Eta = 0.15
      Nu = 0.0
      Ct = 1.0
      Timescale = 0
    EndMonomial
    """
    cfg = parse_input(text)
    hmc = build_hmc(cfg)
    assert isinstance(hmc.monomials[0], SFGaugeMonomial)
    assert abs(hmc.monomials[0].eta - 0.15) < 1e-15
    assert hmc.momenta_mask is not None
    assert float(hmc.momenta_mask[1, 0, 0, 0]) == 0.0
    assert float(hmc.momenta_mask[0, 0, 0, 0]) == 1.0
