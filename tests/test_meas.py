"""Measurement + inverter tests.

Oracles: inverter residual on the full operator; point-source propagator
symmetry; free-field plane-wave decay pinning the Wilson-flow normalization
(amplitude ratio exp(-t phat^2)); Polyakov loop on unit/constant fields.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.inverter import invert_clover_eo, invert_eo
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.meas import (
    online_measurement,
    oriented_plaquettes,
    point_source,
    polyakov_loop,
    wilson_flow,
    wilson_flow_step,
    z2_timeslice_source,
)
from tmlqcd_tpu.ops import wilson as w

DT = jnp.complex128
LAT = Lattice((4, 4, 4, 4))
PARAMS = w.DiracParams(kappa=0.13, mu=0.04)


def _u0(key=0, dt=DT):
    return su3.random_su3(jax.random.key(key), (4,) + LAT.site_shape, dt)


def test_invert_eo_solves_full_operator():
    u = _u0()
    b = rng.normal_spinor(jax.random.key(1), (4, 3) + LAT.site_shape, DT)
    res = invert_eo(u, b, PARAMS, LAT, tol=1e-10, maxiter=3000)
    r = w.d_full(u, res.x, PARAMS, LAT) - b
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-8, rel


def test_invert_clover_eo_solves_full_operator():
    from tmlqcd_tpu.ops import clover as cl
    from tmlqcd_tpu.gamma import apply_gamma5
    from tmlqcd_tpu.lattice import eo_pack, eo_unpack, pack_gauge_eo

    u = _u0()
    params = w.DiracParams(kappa=0.13, mu=0.04, c_sw=1.2)
    b = rng.normal_spinor(jax.random.key(2), (4, 3) + LAT.site_shape, DT)
    res = invert_clover_eo(u, b, params, LAT, tol=1e-10, maxiter=3000)
    # full clover operator on the solution: diag + clover on both parities
    ueo = pack_gauge_eo(u, LAT)
    ph = w.boundary_phases(params, LAT)
    sw_e, sw_o = cl.sw_blocks_eo(u, params.kappa, params.c_sw, LAT)
    xe, xo = eo_pack(res.x, LAT)
    from tmlqcd_tpu.lattice import EVEN, ODD

    me = cl.sw_apply(sw_e, xe, params.mutld, +1.0) - params.kappa * w.dslash_packed(
        ueo, xo, EVEN, LAT, ph
    )
    mo = cl.sw_apply(sw_o, xo, params.mutld, +1.0) - params.kappa * w.dslash_packed(
        ueo, xe, ODD, LAT, ph
    )
    r = eo_unpack(me, mo, LAT) - b
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-8, rel


def test_online_measurement_correlator_positive_symmetric():
    """C_PP(t) > 0, and on a parity-symmetric ensemble member the correlator
    falls then rises around T/2 (cosh shape up to noise); here check
    positivity + source-slice dominance."""
    u = _u0(3)
    cpp, cpa, t0 = online_measurement(u, PARAMS, LAT, jax.random.key(9), t0=1, tol=1e-8)
    cpp = np.asarray(cpp)
    assert cpp.shape == (4,)
    assert np.all(cpp > 0)
    assert cpp[0] == cpp.max()  # contact term dominates
    assert np.all(np.isfinite(np.asarray(cpa)))


def test_pion_norm_positive():
    """PIONNORM estimator (volume Z2 source): positive per-timeslice norm
    of the propagator (reference: meas/pion_norm.c)."""
    from tmlqcd_tpu.meas import pion_norm

    u = _u0(5)
    cpn = np.asarray(pion_norm(u, PARAMS, LAT, jax.random.key(12), tol=1e-8))
    assert cpn.shape == (4,)
    assert np.all(cpn > 0) and np.all(np.isfinite(cpn))


def test_polyakov_unit_field():
    u = jnp.broadcast_to(
        jnp.eye(3, dtype=DT).reshape(3, 3, 1, 1, 1, 1), (3, 3, 4) + LAT.site_shape
    )
    for d in range(4):
        pl = complex(polyakov_loop(u, LAT, d))
        assert abs(pl - 1.0) < 1e-12


def test_polyakov_constant_phase():
    """U_0 = e^{i a lambda} diag phases: P = mean tr(U_0^T)/3 exactly."""
    phase = np.exp(2j * np.pi / (3 * LAT.dims[0]))
    m = np.diag([phase, phase.conjugate(), 1.0]).astype(np.complex128)
    u = np.broadcast_to(
        np.eye(3, dtype=np.complex128).reshape(3, 3, 1, 1, 1, 1),
        (3, 3, 4) + LAT.site_shape,
    ).copy()
    u[:, :, 0] = m.reshape(3, 3, 1, 1, 1)
    pl = complex(polyakov_loop(jnp.asarray(u), LAT, 0))
    expect = np.trace(np.linalg.matrix_power(m, LAT.dims[0])) / 3.0
    assert abs(pl - expect) < 1e-12


def test_oriented_plaquettes_unit():
    u = jnp.broadcast_to(
        jnp.eye(3, dtype=DT).reshape(3, 3, 1, 1, 1, 1), (3, 3, 4) + LAT.site_shape
    )
    op = np.asarray(oriented_plaquettes(u, LAT))
    np.testing.assert_allclose(op, 1.0, atol=1e-14)


def test_flow_free_field_decay():
    """Linearized Wilson flow: a transverse plane-wave mode
    A_1(x_2) ~ cos(2 pi n x2 / L) decays as exp(-t phat^2),
    phat^2 = 4 sin^2(pi n / L).  Pins the Z normalization exactly."""
    lat = Lattice((4, 4, 4, 4))
    n = 1
    amp = 1e-4
    lam = np.diag([1.0, -1.0, 0.0])
    t_, x_, y_, z_ = lat.dims
    theta = amp * np.cos(2 * np.pi * n * np.arange(x_) / x_)  # depends on x (axis 1)
    u = np.broadcast_to(
        np.eye(3, dtype=np.complex128).reshape(3, 3, 1, 1, 1, 1),
        (3, 3, 4) + lat.site_shape,
    ).copy()
    # polarization along mu=2 (y), momentum along x
    for ix in range(x_):
        u[:, :, 2, :, ix, :] = (
            np.diag(np.exp(1j * theta[ix] * np.diag(lam))).reshape(3, 3, 1, 1)
            * np.eye(3).reshape(3, 3, 1, 1)
        )[:, :, :, :]
    u = jnp.asarray(u)
    eps = 0.01
    steps = 10
    v = u
    for _ in range(steps):
        v = wilson_flow_step(v, eps, lat)
    # extract the lambda = diag(1,-1,0) mode amplitude: (angle U00 -
    # angle U11)/2 isolates it from any lambda8-like admixture the flow
    # generates at higher order
    ph0 = (np.angle(np.asarray(u[0, 0, 2])) - np.angle(np.asarray(u[1, 1, 2]))) / 2
    ph1 = (np.angle(np.asarray(v[0, 0, 2])) - np.angle(np.asarray(v[1, 1, 2]))) / 2
    a0 = 2 * np.mean(ph0[0, :, 0] * np.cos(2 * np.pi * n * np.arange(x_) / x_))
    a1 = 2 * np.mean(ph1[0, :, 0] * np.cos(2 * np.pi * n * np.arange(x_) / x_))
    phat2 = 4 * np.sin(np.pi * n / x_) ** 2
    expect = np.exp(-eps * steps * phat2)
    assert abs(a1 / a0 - expect) < 0.02 * expect, (a1 / a0, expect)


def test_flow_scan_monotone_energy():
    """t^2 E grows from ~0 and the flow keeps links in SU(3)."""
    u = _u0(5, jnp.complex64)
    res = wilson_flow(u, LAT, eps=0.02, n_steps=5)
    t2e = np.asarray(res.t2e_plaq)
    assert np.all(np.isfinite(t2e)) and np.all(t2e > 0)
    assert float(su3.unitarity_defect(res.v)) < 1e-5


def test_topological_charge_abelian_flux():
    """Known-answer: an abelian torus flux config with fluxes (n1, n2) in the
    (t,x) and (y,z) planes embedded along lambda = diag(1,-1,0) has
    Q = tr(lambda^2) n1 n2 / ... = 2 n1 n2 in the continuum; the clover
    discretization agrees to O(a^2 f^2) (reference:
    measure_clover_field_strength_observables.c's topological charge)."""
    from tmlqcd_tpu.meas import topological_charge

    lat = LAT  # (T, X, Y, Z)
    T, X, Y, Z = lat.dims
    n1, n2 = 1, 1
    t = np.arange(T).reshape(T, 1, 1)
    x = np.arange(X).reshape(1, X, 1)
    m = np.arange(Y * Z).reshape(1, 1, Y * Z)
    y, z = m // Z, m % Z
    th = np.zeros((4, T, X, Y * Z))
    th[1] = 2 * np.pi * n1 * t / (T * X) + 0 * (x + m)
    th[0] = np.where(t == T - 1, -2 * np.pi * n1 * x / X, 0.0) + 0 * m
    th[3] = 2 * np.pi * n2 * y / (Y * Z) + 0 * (t + x)
    th[2] = np.where(y == Y - 1, -2 * np.pi * n2 * z / Z, 0.0) + 0 * (t + x)
    u = np.zeros((3, 3, 4, T, X, Y * Z), np.complex128)
    for c, e in enumerate([1.0, -1.0, 0.0]):
        u[c, c] = np.exp(1j * e * th)
    q = float(topological_charge(jnp.asarray(u, DT), lat))
    # exact clover value for a constant abelian flux: each leaf's phase is
    # f, so G = sin(f lambda) and Q = 2 n1 n2 (sin f1/f1)(sin f2/f2) ->
    # the continuum 2 n1 n2 as a -> 0
    f1, f2 = 2 * np.pi * n1 / (T * X), 2 * np.pi * n2 / (Y * Z)
    expect = 2.0 * n1 * n2 * (np.sin(f1) / f1) * (np.sin(f2) / f2)
    assert abs(q - expect) < 1e-3 * abs(expect), (q, expect)


def test_topological_charge_unit_field_zero():
    u = jnp.broadcast_to(
        jnp.eye(3, dtype=DT).reshape(3, 3, 1, 1, 1, 1), (3, 3, 4) + LAT.site_shape
    )
    from tmlqcd_tpu.meas import topological_charge

    assert abs(float(topological_charge(u, LAT))) < 1e-10
