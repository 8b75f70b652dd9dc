"""Typed run configuration: the runtime API surface of the framework.

Reference: read_input.l (the flex input lexer) + default_input_values.h —
survey §2.10/Appendix B: the ENTIRE runtime API of the reference is its
input schema (global `Key = value` pairs + BeginMonomial/BeginOperator/
BeginMeasurement blocks).  Here the schema is typed dataclasses; an optional
tmLQCD-input compatibility reader lives in tmlqcd_tpu.config_tmlqcd.

`build_hmc()` lowers a RunConfig to the executable HMCConfig (monomial
objects + integrator) — the analog of the reference wiring monomial_list
from the parsed input.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from tmlqcd_tpu.hmc import (
    CloverDetMonomial,
    CloverDetRatioMonomial,
    CloverTrlogMonomial,
    DetMonomial,
    DetRatioMonomial,
    GaugeMonomial,
    HMCConfig,
    IntegratorConfig,
    Level,
    NDRatCorMonomial,
    NDRatMonomial,
    RatCorMonomial,
    RatMonomial,
)
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops.ndoublet import NDParams
from tmlqcd_tpu.ops.wilson import DiracParams

__all__ = [
    "MonomialSpec",
    "IntegratorSpec",
    "MeasurementSpec",
    "OperatorSpec",
    "RunConfig",
    "build_hmc",
]

# gauge action c1 coefficients by name (reference: g_rgi_C1 input)
GAUGE_ACTIONS = {
    "wilson": 0.0,
    "tlsym": -1.0 / 12.0,
    "iwasaki": -0.331,
    "dbw2": -1.4088,
}


@dataclasses.dataclass(frozen=True)
class MonomialSpec:
    """One BeginMonomial block (reference: monomial/monomial.h fields)."""

    type: str  # GAUGE | DET | DETRATIO | CLOVERDET(RATIO) | CLOVERTRLOG |
    # NDPOLY | ND(CLOVER)RAT(COR) | (CLOVER)RAT(COR)
    timescale: int = 0
    kappa: float = 0.0
    two_kappa_mu: float = 0.0  # 2KappaMu
    two_kappa_mu2: float = 0.0  # 2KappaMu2 (DETRATIO preconditioner)
    csw: float = 0.0
    two_kappa_mubar: float = 0.0  # 2Kappamubar (NDRAT)
    two_kappa_epsbar: float = 0.0  # 2Kappaepsbar (NDRAT)
    rat_order: int = 12
    stilde_min: float = 1e-4
    stilde_max: float = 4.0
    acceptance_precision: float = 1e-18  # |r|^2 tolerances (reference naming)
    force_precision: float = 1e-16
    max_solver_iterations: int = 5000
    solver: str = "auto"  # reference: Solver = CG | MIXEDCG | RGMIXEDCG ...
    csg_history: int = 3  # chrono-guess depth (reference: CSGHistory; 0 off)
    theta: tuple = (1.0, 0.0, 0.0, 0.0)  # boundary phases (ThetaT/X/Y/Z;
    # theta_t = 1 is the conventional antiperiodic time BC)
    eta: float = 0.0  # SFGAUGE boundary-field parameters (sf_gauge_monomial)
    nu: float = 0.0
    ct: float = 1.0  # SF temporal boundary-plaquette improvement weight
    name: str = ""


@dataclasses.dataclass(frozen=True)
class IntegratorSpec:
    """Global integrator keys (reference: tau, NumberTimeScales,
    IntegrationSteps[i], 2MN | LEAPFROG types)."""

    tau: float = 1.0
    steps: tuple[int, ...] = (10,)
    types: tuple[str, ...] = ()  # default: all "2MN"
    lambda_2mn: Optional[float] = None

    def levels(self) -> tuple[Level, ...]:
        types = self.types or tuple("2MN" for _ in self.steps)
        name = {"LEAPFROG": "leapfrog", "2MN": "2mn", "2MNPOSITION": "2mnposition"}
        return tuple(
            Level(name.get(t.upper(), "2mn"), n)
            for t, n in zip(types, self.steps)
        )


@dataclasses.dataclass(frozen=True)
class MeasurementSpec:
    """One BeginMeasurement block."""

    type: str  # ONLINE | GRADIENTFLOW | POLYAKOV | ORIENTEDPLAQUETTES |
    # PIONNORM | FIELDSTRENGTH | SFCOUPLING
    frequency: int = 1
    kappa: float = 0.0
    two_kappa_mu: float = 0.0
    flow_eps: float = 0.02
    flow_steps: int = 50
    direction: int = 0
    max_solver_iterations: int = 5000
    precision: float = 1e-18
    eta: float = 0.0  # SFCOUPLING background-field parameters
    nu: float = 0.0
    ct: float = 1.0


@dataclasses.dataclass(frozen=True)
class OperatorSpec:
    """One BeginOperator block (for invert; reference: operator.c types)."""

    type: str  # TMWILSON | WILSON | CLOVER | DBTMWILSON | DBCLOVER | OVERLAP
    kappa: float = 0.0
    two_kappa_mu: float = 0.0
    csw: float = 0.0
    # non-degenerate doublet operators (DBTMWILSON/DBCLOVER; reference:
    # operator.c mubar/epsbar from 2Kappamubar/2Kappaepsbar)
    two_kappa_mubar: float = 0.0
    two_kappa_epsbar: float = 0.0
    solver: str = "cg"  # cg | mixedcg | fastcg | fastmixed | dflfgmres;
    # OVERLAP: sumr | cgne
    precision: float = 1e-18
    max_solver_iterations: int = 5000
    theta: tuple = (1.0, 0.0, 0.0, 0.0)  # ThetaT/X/Y/Z boundary phases
    propagator_precision: int = 64  # reference: PropagatorPrecision (32|64)
    # OVERLAP-only parameters (reference: Dov_psi.c / invert overlap blocks):
    # m = bare overlap mass, s selects the kernel mass via rho = 1 + s,
    # the sign function uses a degree-`sign_degree` Chebyshev with
    # `sign_n_ev` exactly-deflated low modes of Q_W
    overlap_m: float = 0.0
    overlap_s: float = 0.0
    sign_degree: int = 128
    sign_n_ev: int = 8


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Global run configuration (reference: the global Key = value section)."""

    t: int = 4
    lx: int = 4
    ly: int = 4
    lz: int = 4
    seed: int = 42
    measurements: int = 10  # number of trajectories (reference key name)
    nsave: int = 10
    start_condition: str = "hot"  # hot | cold | continue
    beta: float = 5.7
    gauge_action: str = "wilson"  # wilson | tlsym | iwasaki | dbw2
    integrator: IntegratorSpec = IntegratorSpec()
    monomials: tuple[MonomialSpec, ...] = ()
    operators: tuple[OperatorSpec, ...] = ()
    meas: tuple[MeasurementSpec, ...] = ()
    reversibility_check: bool = False
    reversibility_interval: int = 100
    debug_level: int = 1
    output_dir: str = "."
    checkpoint_format: str = "native"  # native | ildg
    # reference: InitialStoreCounter = readin | N (resume bookkeeping):
    # "readin" reads the nstore counter from the run dir; an integer starts
    # the trajectory counter there (loading that config when continuing)
    initial_store_counter: object = "readin"
    # source generation for the invert driver (reference: source_generation.c
    # driven by SourceType/SourceTimeslice input keys; Jacobi/APE smearing
    # per jacobi.c — the smearing keys are this framework's spellings since
    # the reference configures smearing from the contraction codes)
    source_type: str = "point"  # point | timeslicez2 (Z2 stochastic wall)
    source_timeslice: int = 0
    use_source_smearing: bool = False
    jacobi_kappa: float = 0.21
    jacobi_iterations: int = 5
    ape_alpha: float = 0.5
    ape_iterations: int = 4
    # reference: UseStoutSmearing/StoutRho/StoutNoIterations — operator-level
    # stout smearing of the gauge field read by the invert driver
    use_stout_smearing: bool = False
    stout_rho: float = 0.1
    stout_iterations: int = 1
    # reference: GaugeConfigInputFile (basename; the driver appends
    # .<nstore:04d> like invert.c) and GaugeConfigWritePrecision (32|64 bits
    # per real in the ILDG binary payload)
    gauge_config_input: str = ""
    gauge_write_precision: int = 64
    # reference: NrTProcs/NrXProcs/NrYProcs/NrZProcs — the Cartesian process
    # grid.  Here a MESH HINT: (t, x, y, z) device counts; zeros mean "let
    # parallel.make_mesh choose".  Only t and y (the 'm' axis) are sharded.
    nr_procs: tuple = (0, 0, 0, 0)

    @property
    def lat(self) -> Lattice:
        return Lattice((self.t, self.lx, self.ly, self.lz))


def _mu(two_kappa_mu: float, kappa: float) -> float:
    return two_kappa_mu / (2.0 * kappa) if kappa else 0.0


def build_monomial(spec: MonomialSpec, lat: Lattice, beta: float, c1: float):
    """Lower one MonomialSpec to an executable monomial object
    (reference: add_monomial + the per-type init in monomial.c)."""
    ty = spec.type.upper()
    tol_acc = float(spec.acceptance_precision) ** 0.5  # reference stores |r|^2
    tol_force = float(spec.force_precision) ** 0.5
    common = dict(
        timescale=spec.timescale,
        acc_tol=tol_acc,
        force_tol=tol_force,
        maxiter=spec.max_solver_iterations,
    )
    # solver routing + chrono history apply to the CG-solving det family
    # (multishift rational solves need zero initial guesses)
    det_common = dict(common, solver=spec.solver, chrono_n=spec.csg_history)
    if ty == "GAUGE":
        return GaugeMonomial(lat=lat, beta=beta, c1=c1, timescale=spec.timescale)
    if ty == "SFGAUGE":
        from tmlqcd_tpu.hmc.monomials import SFGaugeMonomial

        return SFGaugeMonomial(
            lat=lat, beta=beta, eta=spec.eta, nu=spec.nu, ct=spec.ct,
            timescale=spec.timescale, name=spec.name or "sfgauge",
        )
    if ty == "DET":
        return DetMonomial(
            lat=lat,
            params=DiracParams(
                kappa=spec.kappa, mu=_mu(spec.two_kappa_mu, spec.kappa),
                theta=tuple(spec.theta),
            ),
            name=spec.name or "det",
            **det_common,
        )
    if ty == "DETRATIO":
        return DetRatioMonomial(
            lat=lat,
            params1=DiracParams(
                kappa=spec.kappa, mu=_mu(spec.two_kappa_mu, spec.kappa),
                theta=tuple(spec.theta),
            ),
            params2=DiracParams(
                kappa=spec.kappa, mu=_mu(spec.two_kappa_mu2, spec.kappa),
                theta=tuple(spec.theta),
            ),
            name=spec.name or "detratio",
            **det_common,
        )
    if ty == "CLOVERDET":
        return CloverDetMonomial(
            lat=lat,
            params=DiracParams(
                kappa=spec.kappa, mu=_mu(spec.two_kappa_mu, spec.kappa),
                c_sw=spec.csw, theta=tuple(spec.theta),
            ),
            name=spec.name or "cloverdet",
            **det_common,
        )
    if ty == "CLOVERDETRATIO":
        return CloverDetRatioMonomial(
            lat=lat,
            params1=DiracParams(
                kappa=spec.kappa, mu=_mu(spec.two_kappa_mu, spec.kappa),
                c_sw=spec.csw, theta=tuple(spec.theta),
            ),
            params2=DiracParams(
                kappa=spec.kappa, mu=_mu(spec.two_kappa_mu2, spec.kappa),
                c_sw=spec.csw, theta=tuple(spec.theta),
            ),
            name=spec.name or "cloverdetratio",
            **det_common,
        )
    if ty == "CLOVERTRLOG":
        return CloverTrlogMonomial(
            lat=lat,
            params=DiracParams(
                kappa=spec.kappa, mu=_mu(spec.two_kappa_mu, spec.kappa), c_sw=spec.csw
            ),
            timescale=spec.timescale,
            name=spec.name or "clovertrlog",
        )
    if ty == "NDPOLY":
        from tmlqcd_tpu.hmc import NDPolyMonomial

        return NDPolyMonomial(
            lat=lat,
            params=NDParams(
                kappa=spec.kappa,
                mubar=_mu(spec.two_kappa_mubar, spec.kappa),
                epsbar=_mu(spec.two_kappa_epsbar, spec.kappa),
                c_sw=spec.csw,
                theta=tuple(spec.theta),
            ),
            degree=max(spec.rat_order, 32),
            s_min=spec.stilde_min,
            s_max=spec.stilde_max,
            timescale=spec.timescale,
            heatbath_tol=float(spec.acceptance_precision) ** 0.5,
            maxiter=spec.max_solver_iterations,
            name=spec.name or "ndpoly",
        )
    if ty in ("NDRAT", "NDCLOVERRAT", "NDRATCOR", "NDCLOVERRATCOR"):
        cls = NDRatCorMonomial if ty.endswith("COR") else NDRatMonomial
        return cls(
            lat=lat,
            params=NDParams(
                kappa=spec.kappa,
                mubar=_mu(spec.two_kappa_mubar, spec.kappa),
                epsbar=_mu(spec.two_kappa_epsbar, spec.kappa),
                c_sw=spec.csw,
                theta=tuple(spec.theta),
            ),
            order=spec.rat_order,
            s_min=spec.stilde_min,
            s_max=spec.stilde_max,
            name=spec.name or ty.lower(),
            **common,
        )
    if ty in ("RAT", "CLOVERRAT", "RATCOR", "CLOVERRATCOR"):
        cls = RatCorMonomial if ty.endswith("COR") else RatMonomial
        return cls(
            lat=lat,
            params=DiracParams(
                kappa=spec.kappa, mu=0.0, c_sw=spec.csw, theta=tuple(spec.theta)
            ),
            order=spec.rat_order,
            s_min=spec.stilde_min,
            s_max=spec.stilde_max,
            name=spec.name or ty.lower(),
            **common,
        )
    raise ValueError(f"unknown monomial type {spec.type!r}")


def build_hmc(cfg: RunConfig) -> HMCConfig:
    """RunConfig -> executable HMCConfig."""
    lat = cfg.lat
    c1 = GAUGE_ACTIONS[cfg.gauge_action.lower()]
    specs = cfg.monomials or (MonomialSpec(type="GAUGE"),)
    monomials = tuple(build_monomial(s, lat, cfg.beta, c1) for s in specs)
    integ = IntegratorConfig(tau=cfg.integrator.tau, levels=cfg.integrator.levels())
    n_levels = len(integ.levels)
    for m in monomials:
        if m.timescale >= n_levels:
            raise ValueError(
                f"monomial {m.name} timescale {m.timescale} >= {n_levels} levels"
            )
    mask = None
    if any(s.type.upper() == "SFGAUGE" for s in specs):
        from tmlqcd_tpu.ops.sf import sf_momenta_mask

        mask = sf_momenta_mask(lat)
    return HMCConfig(lat=lat, monomials=monomials, integrator=integ,
                     momenta_mask=mask)
