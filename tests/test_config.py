"""Config schema + tmLQCD input compatibility reader tests."""

import textwrap

from tmlqcd_tpu.config import IntegratorSpec, MonomialSpec, RunConfig, build_hmc
from tmlqcd_tpu.config_tmlqcd import parse_input
from tmlqcd_tpu.hmc import DetRatioMonomial, GaugeMonomial, NDRatMonomial

SAMPLE = textwrap.dedent(
    """
    # sample-hmc style input (reference grammar)
    L = 4
    T = 8
    Measurements = 100
    NSave = 20
    StartCondition = hot
    Seed = 12345
    beta = 5.3
    tau = 1.0
    NumberOfTimescales = 3
    DebugLevel = 2

    BeginMonomial GAUGE
      Timescale = 0
      IntegrationSteps = 2
    EndMonomial

    BeginMonomial DET
      Timescale = 1
      kappa = 0.1632
      2KappaMu = 0.01
      AcceptancePrecision = 1e-20
      ForcePrecision = 1e-16
      MaxSolverIterations = 2000
      IntegrationSteps = 3
    EndMonomial

    BeginMonomial DETRATIO
      Timescale = 2
      kappa = 0.1632
      2KappaMu = 0.003
      2KappaMu2 = 0.01
      IntegrationSteps = 6
    EndMonomial

    BeginOperator TMWILSON
      kappa = 0.1632
      2KappaMu = 0.003
      Solver = cg
    EndOperator

    BeginMeasurement ONLINE
      Frequency = 4
      kappa = 0.1632
      2KappaMu = 0.003
    EndMeasurement
    """
)


def test_parse_source_and_smearing_keys():
    """SourceType/SourceTimeslice (reference: source_generation.c input keys)
    + the Jacobi/APE smearing key spellings of this framework."""
    cfg = parse_input(SAMPLE + textwrap.dedent(
        """
        SourceType = Timeslice
        SourceTimeslice = 3
        UseSourceSmearing = 1
        JacobiKappa = 0.19
        JacobiIterations = 7
        APEAlpha = 0.4
        APEIterations = 2
        """
    ))
    assert cfg.source_type == "timeslicez2" and cfg.source_timeslice == 3
    assert cfg.use_source_smearing
    assert cfg.jacobi_kappa == 0.19 and cfg.jacobi_iterations == 7
    assert cfg.ape_alpha == 0.4 and cfg.ape_iterations == 2
    # defaults: point source at t=0, no smearing
    base = parse_input(SAMPLE)
    assert base.source_type == "point" and not base.use_source_smearing


def test_parse_tmlqcd_input():
    cfg = parse_input(SAMPLE)
    assert (cfg.t, cfg.lx, cfg.ly, cfg.lz) == (8, 4, 4, 4)
    assert cfg.measurements == 100 and cfg.nsave == 20 and cfg.seed == 12345
    assert cfg.beta == 5.3
    assert [m.type for m in cfg.monomials] == ["GAUGE", "DET", "DETRATIO"]
    assert cfg.monomials[1].kappa == 0.1632
    assert cfg.monomials[1].two_kappa_mu == 0.01
    assert cfg.monomials[2].two_kappa_mu2 == 0.01
    assert cfg.integrator.steps == (2, 3, 6)
    assert cfg.operators[0].type == "TMWILSON"
    assert cfg.meas[0].frequency == 4


def test_build_hmc_from_parsed_input():
    cfg = parse_input(SAMPLE)
    hmc = build_hmc(cfg)
    assert isinstance(hmc.monomials[0], GaugeMonomial)
    assert isinstance(hmc.monomials[2], DetRatioMonomial)
    # 2KappaMu lowering: mu = 2kmu / (2 kappa)
    assert abs(hmc.monomials[1].params.mu - 0.01 / (2 * 0.1632)) < 1e-12
    # reference stores |r|^2 precisions; our tol is sqrt
    assert abs(hmc.monomials[1].acc_tol - 1e-10) < 1e-22
    assert hmc.integrator.levels[2].steps == 6


def test_build_ndrat():
    cfg = RunConfig(
        monomials=(
            MonomialSpec(type="GAUGE"),
            MonomialSpec(
                type="NDRAT",
                timescale=1,
                kappa=0.15,
                two_kappa_mubar=0.04,
                two_kappa_epsbar=0.015,
                rat_order=8,
            ),
        ),
        integrator=IntegratorSpec(tau=1.0, steps=(2, 4)),
    )
    hmc = build_hmc(cfg)
    assert isinstance(hmc.monomials[1], NDRatMonomial)
    assert hmc.monomials[1].order == 8


def test_parse_gauge_io_and_procs_keys():
    """GaugeConfigInputFile / GaugeConfigWritePrecision / NrProcs /
    UseEvenOdd / ReproduceRandomNumbers / 2MNPOSITION (reference:
    read_input.l global keys)."""
    cfg = parse_input(
        textwrap.dedent(
            """
            L = 4
            T = 8
            GaugeConfigInputFile = conf
            GaugeConfigWritePrecision = 32
            InitialStoreCounter = 250
            NrTProcs = 4
            NrYProcs = 2
            UseEvenOdd = 1
            ReproduceRandomNumbers = yes

            BeginMonomial GAUGE
              Timescale = 0
              IntegrationSteps = 3
              IntegratorType = 2MNPOSITION
            EndMonomial
            """
        )
    )
    assert cfg.gauge_config_input == "conf"
    assert cfg.gauge_write_precision == 32
    assert cfg.initial_store_counter == 250
    assert cfg.nr_procs == (4, 0, 2, 0)
    assert cfg.integrator.types == ("2MNPOSITION",)
    assert cfg.integrator.levels()[0].scheme == "2mnposition"
