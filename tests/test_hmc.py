"""HMC self-consistency tests — the reference's production invariants
(survey §4): force-vs-finite-difference, dH ~ dt^2, reversibility,
<exp(-dH)> = 1 (Creutz), and strong-coupling plaquette physics.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import su3
from tmlqcd_tpu.hmc import (
    DetMonomial,
    DetRatioMonomial,
    GaugeMonomial,
    HMCConfig,
    IntegratorConfig,
    Level,
    hmc_trajectory,
    reversibility_check,
)
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops.wilson import DiracParams

LAT = Lattice((4, 4, 4, 4))


def _u0(key=7, dt=jnp.complex64):
    return su3.random_su3(jax.random.key(key), (4,) + LAT.site_shape, dt)


def _tr_fp(f, p):
    """sum_links tr(F P) for leading-axes matrices."""
    return jnp.sum(jnp.einsum("ij...,ji...->...", f, p)).real


def _fd_force_check(mono, u, aux, eps, seed=8):
    """directional derivative of the action vs tr(F P)."""
    f = mono.force(u, aux)
    p = su3.random_momenta(jax.random.key(seed), (4,) + LAT.site_shape, u.dtype)
    sp = mono.action(su3.mul(su3.expm_ta(eps * p), u), aux)
    sm = mono.action(su3.mul(su3.expm_ta(-eps * p), u), aux)
    fd = (sp - sm) / (2 * eps)
    pred = _tr_fp(f, p)
    return abs(float(fd - pred)) / abs(float(fd))


def test_gauge_force_vs_finite_difference():
    u = _u0(dt=jnp.complex128)
    mono = GaugeMonomial(lat=LAT, beta=5.7)
    assert _fd_force_check(mono, u, None, 1e-5) < 1e-6


def test_rectangle_gauge_force_vs_finite_difference():
    u = _u0(dt=jnp.complex128)
    mono = GaugeMonomial(lat=LAT, beta=3.3, c1=-1.0 / 12.0)  # tree-level Symanzik
    assert _fd_force_check(mono, u, None, 1e-5) < 1e-6


def test_det_monomial_heatbath_and_force():
    """Calculus correctness in f64: heatbath S0 == |eta|^2 exactly; force ==
    directional derivative (the grad-vs-hand-force oracle of survey §4, with
    finite differences as the independent implementation)."""
    u = _u0(dt=jnp.complex128)
    mono = DetMonomial(
        lat=LAT, params=DiracParams(kappa=0.15, mu=0.02), acc_tol=1e-12, force_tol=1e-12, maxiter=2000
    )
    aux, s0 = mono.heatbath(u, jax.random.key(5))
    s = mono.action(u, aux)
    assert abs(float(s - s0)) / float(s0) < 1e-12
    assert _fd_force_check(mono, u, aux, 1e-5) < 1e-6


def test_detratio_monomial_heatbath_and_force():
    u = _u0(dt=jnp.complex128)
    mono = DetRatioMonomial(
        lat=LAT,
        params1=DiracParams(kappa=0.15, mu=0.02),
        params2=DiracParams(kappa=0.15, mu=0.12),
        acc_tol=1e-12,
        force_tol=1e-12,
        maxiter=2000,
    )
    aux, s0 = mono.heatbath(u, jax.random.key(6))
    s = mono.action(u, aux)
    assert abs(float(s - s0)) / float(s0) < 1e-12
    assert _fd_force_check(mono, u, aux, 1e-5) < 1e-6


def test_dh_scales_as_dt_squared():
    u = _u0()
    mono = GaugeMonomial(lat=LAT, beta=5.7)
    dh = {}
    for n in (5, 10, 20):
        cfg = HMCConfig(LAT, (mono,), IntegratorConfig(tau=1.0, levels=(Level("leapfrog", n),)))
        _, st = jax.jit(functools.partial(hmc_trajectory, cfg))(u, jax.random.key(42))
        dh[n] = float(st.delta_h)
    assert 3.0 < dh[5] / dh[10] < 5.0
    assert 3.0 < dh[10] / dh[20] < 5.0


def test_2mn_beats_leapfrog():
    """Omelyan at equal force evaluations should give much smaller |dH|."""
    u = _u0()
    mono = GaugeMonomial(lat=LAT, beta=5.7)
    cfg_lf = HMCConfig(LAT, (mono,), IntegratorConfig(tau=1.0, levels=(Level("leapfrog", 20),)))
    cfg_mn = HMCConfig(LAT, (mono,), IntegratorConfig(tau=1.0, levels=(Level("2mn", 10),)))
    _, st_lf = jax.jit(functools.partial(hmc_trajectory, cfg_lf))(u, jax.random.key(1))
    _, st_mn = jax.jit(functools.partial(hmc_trajectory, cfg_mn))(u, jax.random.key(1))
    assert abs(float(st_mn.delta_h)) < abs(float(st_lf.delta_h))


def test_2mnposition_second_order_and_comparable_to_2mn():
    """2MNPOSITION (position-version Omelyan; reference: integrator.c type
    2MNPOSITION): dH scales as dt^2 and |dH| is within an O(1) factor of the
    velocity version at equal step count."""
    u = _u0()
    mono = GaugeMonomial(lat=LAT, beta=5.7)
    dh = {}
    for n in (5, 10):
        cfg = HMCConfig(
            LAT, (mono,), IntegratorConfig(tau=1.0, levels=(Level("2mnposition", n),))
        )
        _, st = jax.jit(functools.partial(hmc_trajectory, cfg))(u, jax.random.key(42))
        dh[n] = float(st.delta_h)
    assert 2.5 < dh[5] / dh[10] < 6.0, dh
    cfg_mn = HMCConfig(
        LAT, (mono,), IntegratorConfig(tau=1.0, levels=(Level("2mn", 10),))
    )
    _, st_mn = jax.jit(functools.partial(hmc_trajectory, cfg_mn))(u, jax.random.key(42))
    assert abs(dh[10]) < 10.0 * abs(float(st_mn.delta_h)) + 1e-6


def test_reversibility():
    u = _u0()
    mono = GaugeMonomial(lat=LAT, beta=5.7)
    cfg = HMCConfig(LAT, (mono,), IntegratorConfig(tau=1.0, levels=(Level("2mn", 10),)))
    ddh, du = jax.jit(functools.partial(reversibility_check, cfg))(u, jax.random.key(3))
    assert float(ddh) < 1e-3  # f32 roundoff scale
    assert float(du) < 1e-4


def test_multi_timescale_nf2_trajectory_runs():
    """Gauge on the fine scale + det on the coarse scale: dH stays O(small)
    and the trajectory accepts from a hot start after a few steps."""
    u = _u0()
    cfg = HMCConfig(
        LAT,
        monomials=(
            GaugeMonomial(lat=LAT, beta=5.3, timescale=0),
            DetMonomial(
                lat=LAT,
                params=DiracParams(kappa=0.15, mu=0.02),
                timescale=1,
                acc_tol=1e-9,
                force_tol=1e-8,
                maxiter=500,
            ),
        ),
        integrator=IntegratorConfig(tau=1.0, levels=(Level("2mn", 4), Level("2mn", 6))),
    )
    traj = jax.jit(functools.partial(hmc_trajectory, cfg))
    for i in range(3):
        u, st = traj(u, jax.random.key(i))
        assert np.isfinite(float(st.delta_h))
    assert abs(float(st.delta_h)) < 1.0


@pytest.mark.slow
def test_creutz_equality_and_strong_coupling_plaquette():
    """<exp(-dH)> = 1 within errors, and <plaq> ~ beta/18 at small beta
    (leading strong-coupling expansion) — physics regression without any
    reference data (survey §7 M0 validation)."""
    beta = 1.0
    mono = GaugeMonomial(lat=LAT, beta=beta)
    cfg = HMCConfig(LAT, (mono,), IntegratorConfig(tau=1.0, levels=(Level("2mn", 12),)))
    traj = jax.jit(functools.partial(hmc_trajectory, cfg))
    u = _u0()
    for i in range(20):
        u, _ = traj(u, jax.random.key(100 + i))
    exps, plaqs = [], []
    for i in range(60):
        u, st = traj(u, jax.random.key(1000 + i))
        exps.append(float(st.exp_mdh))
        plaqs.append(float(st.plaquette))
    e, se = np.mean(exps), np.std(exps) / np.sqrt(len(exps))
    assert abs(e - 1.0) < max(4 * se, 0.02), (e, se)
    p = np.mean(plaqs)
    assert abs(p - beta / 18.0) < 0.012, (p, beta / 18.0)
