"""Auxiliary subsystem tests: chronological guess, force monitoring,
parallel chains, embedding API, mixed-precision CG, FGMRES/GCR/MR, eigen
bounds."""

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.api import init
from tmlqcd_tpu.config import IntegratorSpec, MonomialSpec, OperatorSpec, RunConfig
from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.parallel import chain_init, parallel_chains
from tmlqcd_tpu.solvers import cg, fgmres, gcr, lambda_max, lambda_min, mixed_cg, mr
from tmlqcd_tpu.solvers.chrono import chrono_guess, chrono_init, chrono_push

DT = jnp.complex64
LAT = Lattice((4, 4, 4, 4))
PARAMS = w.DiracParams(kappa=0.12, mu=0.05)


def _ops():
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, DT)
    ueo = pack_gauge_eo(u, LAT)
    ph = w.boundary_phases(PARAMS, LAT)
    qpm = lambda x: w.q_hat_pm(ueo, x, PARAMS, LAT, ph)
    mhat = lambda x: w.m_hat(ueo, x, PARAMS, LAT, ph, +1.0)
    b = rng.normal_spinor(jax.random.key(1), (4, 3) + LAT.eo_site_shape, DT)
    return qpm, mhat, b


def test_chrono_guess_cuts_iterations():
    qpm, _, b = _ops()
    hist = chrono_init(3, b.shape, b.dtype)
    full = cg(qpm, b, tol=1e-6, maxiter=500)
    hist = chrono_push(hist, full.x)
    # nearby rhs: guess from history should nearly solve it
    b2 = b * jnp.asarray(1.0 + 1e-3, jnp.float32)
    x0 = chrono_guess(hist, qpm, b2)
    warm = cg(qpm, b2, x0=x0, tol=1e-6, maxiter=500)
    assert int(warm.iterations) <= max(2, int(full.iterations) // 5)


def test_mixed_cg_converges():
    qpm, _, b = _ops()
    res = jax.jit(lambda b: mixed_cg(qpm, b, tol=1e-6, inner_tol=1e-2))(b)
    rel = float(jnp.linalg.norm(qpm(res.x) - b) / jnp.linalg.norm(b))
    assert rel < 5e-6
    assert int(res.outer_iterations) >= 2  # actually used the outer loop


def test_fgmres_gcr_mr_solve_nonhermitian():
    _, mhat, b = _ops()
    for solver, tol, check in ((fgmres, 1e-6, 5e-6), (gcr, 1e-6, 5e-6), (mr, 1e-3, 1e-2)):
        res = jax.jit(lambda b: solver(mhat, b, tol=tol, restart=8, max_restarts=120)
                      if solver is not mr else mr(mhat, b, tol=tol, maxiter=2000))(b)
        rel = float(jnp.linalg.norm(mhat(res.x) - b) / jnp.linalg.norm(b))
        assert rel < check, (solver.__name__, rel)


def test_fgmres_with_preconditioner():
    qpm, mhat, b = _ops()
    # cheap MR preconditioner makes FGMRES converge in fewer restarts
    precond = lambda v: mr(mhat, v, tol=1e-1, maxiter=10).x
    res = fgmres(mhat, b, precond=precond, tol=1e-6, restart=8, max_restarts=40)
    rel = float(jnp.linalg.norm(mhat(res.x) - b) / jnp.linalg.norm(b))
    assert rel < 5e-6


def test_eigen_bounds_bracket_spectrum():
    qpm, _, b = _ops()
    lmax = float(lambda_max(qpm, b.shape, jax.random.key(3), iters=40, dtype=DT))
    lmin = float(lambda_min(qpm, b.shape, jax.random.key(4), iters=8, dtype=DT))
    assert 0 < lmin < lmax
    # Rayleigh quotients of random vectors must fall inside [lmin', lmax']
    for k in range(3):
        v = rng.normal_spinor(jax.random.key(10 + k), b.shape, DT)
        rq = float(
            jnp.vdot(v, qpm(v)).real / jnp.vdot(v, v).real
        )
        assert 0.9 * lmin < rq < 1.1 * lmax


def test_parallel_chains_match_single():
    """vmapped chains: chain c with key k equals a single trajectory with
    the same (u, key) — replica parallelism is exact."""
    import functools

    from tmlqcd_tpu.config import build_hmc
    from tmlqcd_tpu.hmc import hmc_trajectory

    cfg = build_hmc(
        RunConfig(
            monomials=(MonomialSpec(type="GAUGE"),),
            integrator=IntegratorSpec(tau=1.0, steps=(3,)),
            beta=5.5,
        )
    )
    make_u = lambda k: su3.random_su3(k, (4,) + LAT.site_shape, DT)
    us = chain_init(2, make_u, jax.random.key(7))
    keys = jax.random.split(jax.random.key(8), 2)
    u_out, stats = jax.jit(lambda u, k: parallel_chains(cfg, u, k))(us, keys)
    ref_u, ref_st = jax.jit(functools.partial(hmc_trajectory, cfg))(us[1], keys[1])
    np.testing.assert_allclose(np.asarray(u_out[1]), np.asarray(ref_u), atol=1e-6)
    assert abs(float(stats.delta_h[1] - ref_st.delta_h)) < 1e-6


def test_monitor_forces():
    from tmlqcd_tpu.config import build_hmc
    from tmlqcd_tpu.hmc.monitor import monitor_forces

    cfg = build_hmc(
        RunConfig(
            monomials=(
                MonomialSpec(type="GAUGE"),
                MonomialSpec(
                    type="DET", timescale=1, kappa=0.12,
                    two_kappa_mu=0.01, max_solver_iterations=300,
                    acceptance_precision=1e-14, force_precision=1e-14,
                ),
            ),
            integrator=IntegratorSpec(tau=1.0, steps=(2, 4)),
            beta=5.5,
        )
    )
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, DT)
    stats = monitor_forces(cfg, u, jax.random.key(1))
    assert len(stats) == 2
    for s in stats:
        assert s.norm_sq > 0 and s.max_abs > 0 and np.isfinite(s.rms)
    # gauge force at beta ~ 5.5 dominates the small-mass fermion force RMS
    assert stats[0].rms > stats[1].rms


def test_api_session_roundtrip(tmp_path):
    cfg = RunConfig(
        beta=5.5,
        seed=3,
        monomials=(MonomialSpec(type="GAUGE"),),
        integrator=IntegratorSpec(tau=0.5, steps=(4,)),
        operators=(
            OperatorSpec(type="TMWILSON", kappa=0.12, two_kappa_mu=0.01,
                         precision=1e-16, max_solver_iterations=1000),
        ),
    )
    s = init(cfg)
    s.hot_start()
    stats = s.run_hmc(1)
    assert len(stats) == 1 and 0 < s.plaquette() < 1
    # inversion through the session
    from tmlqcd_tpu.meas.sources import point_source

    src = point_source(s.lat, 0, 0)
    x = s.invert(src)
    params = w.DiracParams(kappa=0.12, mu=0.01 / (2 * 0.12))
    r = w.d_full(s.gauge, x, params, s.lat) - src
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(src)) < 1e-6
    # gauge write/read roundtrip via ILDG
    p = str(tmp_path / "conf.lime")
    s.write_gauge(p)
    s2 = init(cfg)
    s2.read_gauge(p)
    np.testing.assert_allclose(
        np.asarray(s2.gauge), np.asarray(s.gauge), atol=1e-7
    )
