"""Lattice operators: gauge action/observables, Dirac operators, clover term.

The reference implements these as hand-vectorized C kernels (operator/*.c,
get_staples.c, measure_gauge_action.c); here they are batched jnp expressions
(XLA-fused) plus optional Pallas kernels for the hot dslash path.
"""

from tmlqcd_tpu.ops.gauge_action import (  # noqa: F401
    gauge_action,
    gauge_force,
    plaquette,
    rectangle,
)
from tmlqcd_tpu.ops.wilson import (  # noqa: F401
    DiracParams,
    dslash_full,
    dslash_packed,
    d_full,
    mee_inv_packed,
    m_hat,
    q_hat,
    q_hat_pm,
)
