"""Measurements: gauge observables, online correlators, gradient flow,
sources (reference: meas/*.c, polyakov_loop.c, source_generation.c)."""

from tmlqcd_tpu.meas.gauge_obs import (  # noqa: F401
    field_strength_observables,
    oriented_plaquettes,
    polyakov_loop,
    topological_charge,
)
from tmlqcd_tpu.meas.sources import (  # noqa: F401
    gaussian_timeslice_source,
    point_source,
    volume_source,
    z2_timeslice_source,
)
from tmlqcd_tpu.meas.correlators import (  # noqa: F401
    effective_mass,
    online_measurement,
    pion_norm,
    pion_correlator,
)
from tmlqcd_tpu.meas.gradient_flow import (  # noqa: F401
    energy_clover,
    energy_plaq,
    t0_scale,
    wilson_flow,
    wilson_flow_step,
)
