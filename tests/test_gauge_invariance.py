"""Gauge-invariance/covariance oracles on random (non-abelian) fields.

These catch loop-ordering bugs (e.g. U vs U^dag, operand-order swaps in
plaquette/staple assembly) that EVERY self-consistent test misses: FD-vs-AD
force checks, dH conservation, reversibility and <exp(-dH)>=1 hold for any
smooth "action", and abelian known-answer configs have commuting links where
operand order is invisible.  A wrong-ordered plaquette survived rounds 1-3
exactly this way (fixed in round 4) — this file pins the whole observable
surface against regressions.

Under U_mu(x) -> g(x) U_mu(x) g(x+mu)^+ :
  - closed-loop traces (plaquette, rectangle, Polyakov, E_clover, Q_top)
    are invariant,
  - APE/Jacobi smearing is covariant (smeared-field plaquette invariant),
  - the Dirac operator is covariant: D[U^g](g psi) = g (D[U] psi).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import Lattice, shift_full
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.ops.gauge_action import gauge_action, plaquette, rectangle

LAT = Lattice((4, 4, 4, 4))
DT = jnp.complex128


@pytest.fixture(scope="module")
def fields():
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, DT)
    g = su3.random_su3(jax.random.key(1), LAT.site_shape, DT)
    ug = jnp.stack(
        [
            su3.mul(su3.mul(g, u[:, :, mu]), su3.adj(shift_full(g, mu, +1, LAT)))
            for mu in range(4)
        ],
        axis=2,
    )
    return u, ug, g


def test_plaquette_and_rectangle_invariant(fields):
    u, ug, _ = fields
    assert abs(float(plaquette(u, LAT) - plaquette(ug, LAT))) < 1e-12
    assert abs(float(rectangle(u, LAT) - rectangle(ug, LAT))) < 1e-12


def test_gauge_action_invariant(fields):
    u, ug, _ = fields
    for c1 in (0.0, -1.0 / 12.0):
        s0 = float(gauge_action(u, 5.7, LAT, c1))
        s1 = float(gauge_action(ug, 5.7, LAT, c1))
        assert abs(s0 - s1) / abs(s0) < 1e-12


def test_plaquette_matches_brute_force():
    """Fully independent dense-loop construction on a 2^4 lattice."""
    lat = Lattice((2, 2, 2, 2))
    u = su3.random_su3(jax.random.key(5), (4,) + lat.site_shape, DT)
    U = np.asarray(u)
    t_, x_, y_, z_ = lat.dims

    def link(mu, t, x, y, z):
        return U[:, :, mu, t % t_, x % x_, (y % y_) * z_ + (z % z_)]

    tot, n = 0.0, 0
    import itertools

    for t, x, y, z in itertools.product(range(t_), range(x_), range(y_), range(z_)):
        pos = [t, x, y, z]
        for mu in range(4):
            for nu in range(mu + 1, 4):
                pp = lambda m: [pos[i] + (1 if i == m else 0) for i in range(4)]
                tot += np.trace(
                    link(mu, *pos)
                    @ link(nu, *pp(mu))
                    @ link(mu, *pp(nu)).conj().T
                    @ link(nu, *pos).conj().T
                ).real
                n += 1
    assert abs(float(plaquette(u, lat)) - tot / (3 * n)) < 1e-12


def test_field_strength_observables_invariant(fields):
    from tmlqcd_tpu.meas.gauge_obs import field_strength_observables

    u, ug, _ = fields
    ep0, ec0, q0 = (float(v) for v in field_strength_observables(u, LAT))
    ep1, ec1, q1 = (float(v) for v in field_strength_observables(ug, LAT))
    assert abs(ep0 - ep1) / abs(ep0) < 1e-12
    assert abs(ec0 - ec1) / abs(ec0) < 1e-12
    assert abs(q0 - q1) < 1e-12


def test_polyakov_invariant(fields):
    from tmlqcd_tpu.meas.gauge_obs import polyakov_loop

    u, ug, _ = fields
    for d in (0, 2):
        p0 = complex(polyakov_loop(u, LAT, d))
        p1 = complex(polyakov_loop(ug, LAT, d))
        assert abs(p0 - p1) < 1e-12


def test_ape_smearing_covariant(fields):
    from tmlqcd_tpu.meas.smearing import ape_smear_spatial

    u, ug, _ = fields
    p0 = float(plaquette(ape_smear_spatial(u, LAT, alpha=0.5, n_iter=2), LAT))
    p1 = float(plaquette(ape_smear_spatial(ug, LAT, alpha=0.5, n_iter=2), LAT))
    assert abs(p0 - p1) < 1e-12


def test_dirac_operator_covariant(fields):
    u, ug, g = fields
    params = w.DiracParams(kappa=0.13, mu=0.05, theta=(1.0, 0.0, 0.0, 0.0))
    psi = rng.normal_spinor(jax.random.key(2), (4, 3) + LAT.site_shape, DT)
    gpsi = jnp.einsum("ab...,sb...->sa...", g, psi)
    lhs = w.d_full(ug, gpsi, params, LAT)
    rhs = jnp.einsum("ab...,sb...->sa...", g, w.d_full(u, psi, params, LAT))
    assert float(jnp.max(jnp.abs(lhs - rhs))) < 1e-12


def test_gradient_flow_energy_invariant(fields):
    from tmlqcd_tpu.meas.gradient_flow import energy_clover, energy_plaq, wilson_flow_step

    u, ug, _ = fields
    assert abs(float(energy_plaq(u, LAT) - energy_plaq(ug, LAT))) < 1e-10
    assert abs(float(energy_clover(u, LAT) - energy_clover(ug, LAT))) < 1e-10
    # one flow step stays covariant: flowed plaquette invariant
    v0 = wilson_flow_step(u, 0.01, LAT)
    v1 = wilson_flow_step(ug, 0.01, LAT)
    assert abs(float(plaquette(v0, LAT) - plaquette(v1, LAT))) < 1e-10