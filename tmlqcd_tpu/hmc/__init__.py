"""HMC core: monomials (action terms), multi-timescale symplectic integrators,
and the trajectory update (reference: monomial/, integrator.c, update_tm.c)."""

from tmlqcd_tpu.hmc.monomials import (  # noqa: F401
    CloverDetMonomial,
    CloverDetRatioMonomial,
    CloverTrlogMonomial,
    DetMonomial,
    DetRatioMonomial,
    GaugeMonomial,
)
from tmlqcd_tpu.hmc.rational_monomials import (  # noqa: F401
    NDRatCorMonomial,
    NDRatMonomial,
    RatCorMonomial,
    RatMonomial,
)
from tmlqcd_tpu.hmc.poly_monomials import NDPolyMonomial  # noqa: F401
from tmlqcd_tpu.hmc.integrators import IntegratorConfig, Level  # noqa: F401
from tmlqcd_tpu.hmc.trajectory import HMCConfig, TrajectoryStats, chrono_states, hmc_trajectory, reversibility_check  # noqa: F401
from tmlqcd_tpu.hmc.validate import check_rational_intervals  # noqa: F401
