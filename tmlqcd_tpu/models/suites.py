"""Standard action suites (BASELINE.json staged configs 1-3).

Config 4 (Nf=2+1+1 twisted clover + rational) is added by the clover/ndrat
modules once present.
"""

from __future__ import annotations

from tmlqcd_tpu.hmc import (
    DetMonomial,
    DetRatioMonomial,
    GaugeMonomial,
    HMCConfig,
    IntegratorConfig,
    Level,
)
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops.wilson import DiracParams

__all__ = ["pure_gauge", "nf2_wilson", "nf2_twisted_mass_hasenbusch"]


def pure_gauge(
    lat: Lattice,
    beta: float,
    c1: float = 0.0,
    tau: float = 1.0,
    steps: int = 12,
) -> HMCConfig:
    """Config 1: pure SU(3) plaquette(-rectangle) HMC
    (reference: sample-hmc input with a single GAUGE monomial)."""
    return HMCConfig(
        lat=lat,
        monomials=(GaugeMonomial(lat=lat, beta=beta, c1=c1, timescale=0),),
        integrator=IntegratorConfig(tau=tau, levels=(Level("2mn", steps),)),
    )


def nf2_wilson(
    lat: Lattice,
    beta: float,
    kappa: float,
    tau: float = 1.0,
    gauge_steps: int = 3,
    fermion_steps: int = 8,
    acc_tol: float = 1e-9,
    force_tol: float = 1e-8,
    maxiter: int = 2000,
) -> HMCConfig:
    """Config 2: two degenerate Wilson flavors (mu = 0), e/o-preconditioned
    pseudofermion on the coarse timescale, gauge on the fine one
    (reference: BeginMonomial DET + GAUGE)."""
    return HMCConfig(
        lat=lat,
        monomials=(
            GaugeMonomial(lat=lat, beta=beta, timescale=0),
            DetMonomial(
                lat=lat,
                params=DiracParams(kappa=kappa, mu=0.0),
                timescale=1,
                acc_tol=acc_tol,
                force_tol=force_tol,
                maxiter=maxiter,
            ),
        ),
        integrator=IntegratorConfig(
            tau=tau, levels=(Level("2mn", gauge_steps), Level("2mn", fermion_steps))
        ),
    )


def nf2_twisted_mass_hasenbusch(
    lat: Lattice,
    beta: float,
    kappa: float,
    mu: float,
    mu_hasenbusch: float,
    c1: float = 0.0,
    tau: float = 1.0,
    steps: tuple[int, int, int] = (2, 2, 6),
    acc_tol: float = 1e-9,
    force_tol: float = 1e-8,
    maxiter: int = 2000,
) -> HMCConfig:
    """Config 3: Nf=2 twisted mass with one Hasenbusch splitting on three
    timescales — gauge (finest), heavy preconditioner det(mu2), ratio
    det(mu)/det(mu2) (coarsest; smooth, expensive force)
    (reference: BeginMonomial GAUGE + DET(mu2) + DETRATIO blocks with
    Timescale assignments; survey §2.7)."""
    light = DiracParams(kappa=kappa, mu=mu)
    heavy = DiracParams(kappa=kappa, mu=mu_hasenbusch)
    return HMCConfig(
        lat=lat,
        monomials=(
            GaugeMonomial(lat=lat, beta=beta, c1=c1, timescale=0),
            DetMonomial(
                lat=lat, params=heavy, timescale=1,
                acc_tol=acc_tol, force_tol=force_tol, maxiter=maxiter, name="det_heavy",
            ),
            DetRatioMonomial(
                lat=lat, params1=light, params2=heavy, timescale=2,
                acc_tol=acc_tol, force_tol=force_tol, maxiter=maxiter,
            ),
        ),
        integrator=IntegratorConfig(
            tau=tau,
            levels=(Level("2mn", steps[0]), Level("2mn", steps[1]), Level("2mn", steps[2])),
        ),
    )
