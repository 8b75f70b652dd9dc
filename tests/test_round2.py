"""Round-2 wiring tests: chrono guess in the MD/acceptance solves, the
dispatch-seam Solver= routing, reliable-update mixed CG, MG-preconditioned
inversion, input-schema completeness (theta BCs, global inheritance,
InitialStoreCounter), and spectral-interval validation.

Reference behaviors: chrono_guess.c called per derivativefunction,
rg_mixed_cg_her.c, DDalphaAMG_interface.c + dfl_projector.c reachable from
invert, read_input.l key coverage, the ndrat-init eigenvalue check.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.config_tmlqcd import parse_input
from tmlqcd_tpu.hmc import (
    DetMonomial,
    GaugeMonomial,
    HMCConfig,
    IntegratorConfig,
    Level,
    NDRatMonomial,
    hmc_trajectory,
)
from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.solvers.cg import cg, cg_info
from tmlqcd_tpu.solvers.mixed_cg import mixed_cg, rg_mixed_cg

DT = jnp.complex64
LAT = Lattice((4, 4, 4, 4))
PARAMS = w.DiracParams(kappa=0.15, mu=0.08)


def _u(seed=0):
    return su3.random_su3(jax.random.key(seed), (4,) + LAT.site_shape, DT)


def _qpm(u):
    ueo = pack_gauge_eo(u, LAT)
    ph = w.boundary_phases(PARAMS, LAT)
    return lambda x: w.q_hat_pm(ueo, x, PARAMS, LAT, ph)


def _b(seed=1):
    return rng.normal_spinor(jax.random.key(seed), (4, 3) + LAT.eo_site_shape, DT)


# ---------------------------------------------------------------------------
# chrono threading through force/acceptance solves
# ---------------------------------------------------------------------------


def test_force_chrono_reduces_iterations():
    """Two force solves at the same U: the second starts from the pushed
    solution and should converge almost immediately."""
    u = _u()
    det = DetMonomial(lat=LAT, params=PARAMS, acc_tol=1e-8, force_tol=1e-8,
                      chrono_n=3)
    phi, _ = det.heatbath(u, jax.random.key(5))
    h0 = det.chrono_init_state()
    _, h1, it_cold = det.force_chrono(u, phi, h0)
    _, h2, it_warm = det.force_chrono(u, phi, h1)
    assert int(it_warm) <= max(2, int(it_cold) // 5), (int(it_cold), int(it_warm))
    assert int(h2.count) == 2


def test_trajectory_chrono_matches_and_cuts_acceptance_iters():
    """Chrono on vs off: same physics (dH within solver tolerance), fewer
    acceptance iterations, and force iterations reported in the stats."""
    integ = IntegratorConfig(tau=0.4, levels=(Level("2mn", 1), Level("2mn", 2)))
    g = GaugeMonomial(lat=LAT, beta=5.3, timescale=0)
    mk = lambda n: DetMonomial(lat=LAT, params=PARAMS, timescale=1,
                               acc_tol=1e-9, force_tol=1e-8, chrono_n=n)
    u = jax.jit(lambda k: su3.random_su3(k, (4,) + LAT.site_shape, DT))(
        jax.random.key(0)
    )
    key = jax.random.key(7)
    run = lambda n: jax.jit(
        functools.partial(hmc_trajectory, HMCConfig(LAT, (g, mk(n)), integ))
    )(u, key)
    _, st_on = run(3)
    _, st_off = run(0)
    assert abs(float(st_on.delta_h) - float(st_off.delta_h)) < 5e-4
    assert int(st_on.acc_iterations[1]) < int(st_off.acc_iterations[1])
    assert int(st_on.force_iterations[1]) > 0


# ---------------------------------------------------------------------------
# reliable-update mixed CG (reference: rg_mixed_cg_her.c)
# ---------------------------------------------------------------------------


def test_rg_mixed_cg_converges_and_replaces():
    u = _u()
    qpm = _qpm(u)
    b = _b()
    res = jax.jit(lambda b: rg_mixed_cg(qpm, b, tol=1e-6, delta=0.05))(b)
    rel = float(jnp.linalg.norm(qpm(res.x) - b) / jnp.linalg.norm(b))
    assert rel < 5e-6
    assert int(res.outer_iterations) >= 1  # at least one reliable update fired


def test_rg_mixed_cg_beats_defect_correction_floor():
    """With a crude low-precision operator the defect-correction inner CG
    keeps restarting from scratch; the reliable-update stream reaches the
    same tolerance in fewer LOW-precision matvecs."""
    u = _u()
    qpm = _qpm(u)
    b = _b()
    # crude low operator: bfloat16-rounded inputs/outputs
    qpm_lo = lambda v: qpm(v.astype(jnp.complex64)).astype(jnp.complex64)

    def lo(v):
        vb = (v.real.astype(jnp.bfloat16).astype(jnp.float32)
              + 1j * v.imag.astype(jnp.bfloat16).astype(jnp.float32)).astype(DT)
        out = qpm(vb)
        return (out.real.astype(jnp.bfloat16).astype(jnp.float32)
                + 1j * out.imag.astype(jnp.bfloat16).astype(jnp.float32)).astype(DT)

    r1 = jax.jit(lambda b: rg_mixed_cg(qpm, b, matvec_lo=lo, tol=1e-5, delta=0.05))(b)
    r2 = jax.jit(lambda b: mixed_cg(qpm, b, matvec_lo=lo, tol=1e-5, inner_tol=1e-2))(b)
    rel1 = float(jnp.linalg.norm(qpm(r1.x) - b) / jnp.linalg.norm(b))
    assert rel1 < 5e-5
    # both converge; rg must not need more low matvecs than defect correction
    assert int(r1.inner_iterations) <= int(r2.inner_iterations) + 5


def test_cg_info_reports_true_residual():
    u = _u()
    qpm = _qpm(u)
    b = _b()
    res, true_rsq = cg_info(qpm, b, tol=1e-6, maxiter=400)
    # true residual consistent with the iterated one at this tolerance
    assert float(true_rsq) < 10.0 * float(res.residual_sq) + 1e-10


# ---------------------------------------------------------------------------
# MG-preconditioned inversion end-to-end (reference: config 4 criterion)
# ---------------------------------------------------------------------------


def test_invert_eo_dflfgmres_end_to_end():
    from tmlqcd_tpu.inverter import invert_eo, make_deflation_setup

    u = _u(3)
    params = w.DiracParams(kappa=0.16, mu=0.01)  # lightish
    src = jnp.zeros((4, 3) + LAT.site_shape, DT).at[0, 0, 0, 0, 0].set(1.0)
    setup = make_deflation_setup(u, params, LAT, n_vectors=4, blocks=(2, 2, 2),
                                 inv_iters=2, smooth_iters=3)
    res = invert_eo(u, src, params, LAT, tol=1e-8, maxiter=800,
                    solver="dflfgmres", deflation_setup=setup)
    ref = invert_eo(u, src, params, LAT, tol=1e-8, maxiter=2000, solver="cg")
    diff = float(jnp.linalg.norm(res.x - ref.x) / jnp.linalg.norm(ref.x))
    assert diff < 1e-4, diff


# ---------------------------------------------------------------------------
# input schema: theta BCs, global inheritance, solver keys, counters
# ---------------------------------------------------------------------------

INPUT_TEXT = """
L = 4
T = 8
kappa = 0.1394
2KappaMu = 0.004
CSW = 1.69
ThetaT = 1.0
ThetaX = 0.25
InitialStoreCounter = 120
Measurements = 3

BeginMonomial GAUGE
  Timescale = 0
EndMonomial

BeginMonomial CLOVERDET
  Timescale = 1
  Solver = rgmixedcg
  CSGHistory = 2
  IntegrationSteps = 4
EndMonomial

BeginOperator TMWILSON
  Solver = dflfgmres
  PropagatorPrecision = 32
EndOperator
"""


def test_input_schema_completeness():
    cfg = parse_input(INPUT_TEXT)
    assert (cfg.t, cfg.lx, cfg.ly, cfg.lz) == (8, 4, 4, 4)
    assert cfg.initial_store_counter == 120
    det = cfg.monomials[1]
    # global kappa/2KappaMu/CSW inherited into the block
    assert det.kappa == pytest.approx(0.1394)
    assert det.two_kappa_mu == pytest.approx(0.004)
    assert det.csw == pytest.approx(1.69)
    assert det.solver == "rgmixedcg"
    assert det.csg_history == 2
    # theta reaches the monomial spec AND the built DiracParams
    assert det.theta == pytest.approx((1.0, 0.25, 0.0, 0.0))
    from tmlqcd_tpu.config import build_monomial

    m = build_monomial(det, cfg.lat, 5.3, 0.0)
    assert m.params.theta == pytest.approx((1.0, 0.25, 0.0, 0.0))
    assert m.solver == "rgmixedcg"
    assert m.chrono_n == 2
    op = cfg.operators[0]
    assert op.solver == "dflfgmres"
    assert op.propagator_precision == 32
    assert op.kappa == pytest.approx(0.1394)
    assert op.theta == pytest.approx((1.0, 0.25, 0.0, 0.0))


def test_theta_changes_operator():
    """Twisted BCs must actually reach the operator: different theta ->
    different Dirac applications (the correctness trap of VERDICT item 5)."""
    u = _u(4)
    b = _b(9)
    pa = w.DiracParams(kappa=0.15, mu=0.05, theta=(1.0, 0.0, 0.0, 0.0))
    pb = w.DiracParams(kappa=0.15, mu=0.05, theta=(1.0, 0.5, 0.0, 0.0))
    ueo = pack_gauge_eo(u, LAT)
    ya = w.q_hat(ueo, b, pa, LAT, w.boundary_phases(pa, LAT), +1.0)
    yb = w.q_hat(ueo, b, pb, LAT, w.boundary_phases(pb, LAT), +1.0)
    assert float(jnp.linalg.norm(ya - yb)) > 1e-3


# ---------------------------------------------------------------------------
# spectral-interval validation (reference: ndrat init eigenvalue check)
# ---------------------------------------------------------------------------


def test_check_rational_intervals():
    from tmlqcd_tpu.hmc.validate import check_rational_intervals
    from tmlqcd_tpu.ops.ndoublet import NDParams

    u = _u(6)
    nd_params = NDParams(kappa=0.115, mubar=0.12, epsbar=0.09)
    good = NDRatMonomial(lat=LAT, params=nd_params, order=6,
                         s_min=1e-4, s_max=4.0, name="good")
    bad = NDRatMonomial(lat=LAT, params=nd_params, order=6,
                        s_min=0.5, s_max=0.6, name="bad")
    checks = check_rational_intervals([good, bad], u, verbose=False)
    assert checks[0].ok
    assert not checks[1].ok
    with pytest.raises(ValueError):
        check_rational_intervals([bad], u, strict=True, verbose=False)


def test_halo_comm_accounting():
    """Simulated ICI comm volume per sharded hop (reference: the
    xchange_field message sizes) — sanity relations: halfspinor halves the
    bytes; finer meshes shrink local HBM but grow the comm ratio."""
    from tmlqcd_tpu.parallel import halo_bytes_per_dslash

    lat = Lattice((32, 32, 32, 64))
    full = halo_bytes_per_dslash(lat, (4, 2), halfspinor=False)
    half = halo_bytes_per_dslash(lat, (4, 2), halfspinor=True)
    assert half["bytes_per_hop"] * 2 == full["bytes_per_hop"]
    one = halo_bytes_per_dslash(lat, (1, 1))
    assert one["bytes_per_hop"] == 0
    d42 = halo_bytes_per_dslash(lat, (4, 2))
    d82 = halo_bytes_per_dslash(lat, (8, 2))
    assert d82["comm_to_hbm_ratio"] > d42["comm_to_hbm_ratio"]
    # t-halo: 2 messages of (X * m_loc) halfspinor sites = 48 B each
    assert d42["t_halo_bytes"] == 2 * 32 * (32 * 32 // 2) * 48
