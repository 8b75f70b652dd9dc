"""Clover monomial calculus tests (reference: cloverdet_monomial.c,
cloverdetratio_monomial.c, clovertrlog_monomial.c): heatbath exactness and
force-vs-finite-difference in f64."""

import jax
import jax.numpy as jnp

from tmlqcd_tpu import su3
from tmlqcd_tpu.hmc import CloverDetMonomial, CloverDetRatioMonomial, CloverTrlogMonomial
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops.wilson import DiracParams

LAT = Lattice((4, 4, 4, 4))


def _u0(dt=jnp.complex128):
    return su3.random_su3(jax.random.key(17), (4,) + LAT.site_shape, dt)


def _fd_check(mono, u, aux, eps=1e-5, seed=8):
    f = mono.force(u, aux)
    p = su3.random_momenta(jax.random.key(seed), (4,) + LAT.site_shape, u.dtype)
    sp = mono.action(su3.mul(su3.expm_ta(eps * p), u), aux)
    sm = mono.action(su3.mul(su3.expm_ta(-eps * p), u), aux)
    fd = (sp - sm) / (2 * eps)
    pred = jnp.sum(jnp.einsum("ij...,ji...->...", f, p)).real
    return abs(float(fd - pred)) / abs(float(fd))


def test_cloverdet_heatbath_and_force():
    u = _u0()
    mono = CloverDetMonomial(
        lat=LAT, params=DiracParams(kappa=0.14, mu=0.02, c_sw=1.3),
        acc_tol=1e-12, force_tol=1e-12, maxiter=2000,
    )
    aux, s0 = mono.heatbath(u, jax.random.key(5))
    s = mono.action(u, aux)
    assert abs(float(s - s0)) / float(s0) < 1e-11
    assert _fd_check(mono, u, aux) < 1e-6


def test_cloverdetratio_heatbath_and_force():
    u = _u0()
    mono = CloverDetRatioMonomial(
        lat=LAT,
        params1=DiracParams(kappa=0.14, mu=0.01, c_sw=1.3),
        params2=DiracParams(kappa=0.14, mu=0.08, c_sw=1.3),
        acc_tol=1e-12, force_tol=1e-12, maxiter=2000,
    )
    aux, s0 = mono.heatbath(u, jax.random.key(6))
    s = mono.action(u, aux)
    assert abs(float(s - s0)) / float(s0) < 1e-11
    assert _fd_check(mono, u, aux) < 1e-6


def test_clovertrlog_force():
    u = _u0()
    mono = CloverTrlogMonomial(
        lat=LAT, params=DiracParams(kappa=0.14, mu=0.02, c_sw=1.3)
    )
    _, s0 = mono.heatbath(u, jax.random.key(7))
    assert abs(float(mono.action(u, None) - s0)) < 1e-12
    assert _fd_check(mono, u, None) < 1e-6
