"""Preconfigured physics "models": complete monomial stacks + integrator
setups for the standard simulation families (the framework's model zoo).

Reference analog: the sample-input/*.input files + the monomial/operator
blocks of read_input.l — a model here is what an input file describes there.

Each builder returns an HMCConfig matching one of the staged BASELINE.json
configs (survey §7 build order).
"""

from tmlqcd_tpu.models.suites import (  # noqa: F401
    nf2_twisted_mass_hasenbusch,
    nf2_wilson,
    pure_gauge,
)
