"""tmlqcd_tpu — a TPU-native lattice-QCD HMC engine.

A brand-new JAX/XLA/Pallas framework with the capability surface of tmLQCD
(urbach/tmLQCD): Hybrid Monte Carlo sampling of SU(3) gauge configurations for
Wilson twisted-mass fermions (clover term, Hasenbusch mass preconditioning,
rational approximation for the non-degenerate doublet, multi-timescale Omelyan
integration), Krylov propagator inverters, online measurements (plaquette, pion
correlator, gradient flow, Polyakov loop), and ILDG-compatible checkpointing.

Design notes (TPU-first, not a port):
  * Fields are plain jnp complex arrays; all "SIMD kernels" of the reference
    (su3.h / sse.h macro families) collapse into batched einsums fused by XLA.
  * All MD forces are derived with jax.grad of the action (with the
    implicit-function trick through Krylov solves) instead of hand-written
    derivative kernels (reference: deriv_Sb.c, get_staples.c, sw_deriv).
  * Distribution is jax.sharding over a device Mesh: halo exchange
    (reference: xchange/*.c) becomes XLA collective-permutes emitted for
    jnp.roll on sharded axes; global reductions (MPI_Allreduce) become psum.
  * Reproducible RNG (reference: ranlxd.c + reproduce_randomnumber_flag) is
    counter-based threefry keyed by (trajectory, purpose), giving
    decomposition-independent streams by construction.

f64 note: double precision is enabled at import (scalar reductions for ΔH-grade
accuracy need it; fields stay complex64/f32 everywhere hot). Set
TMLQCD_TPU_X64=0 to opt out.
"""

import os as _os

import jax as _jax

if _os.environ.get("TMLQCD_TPU_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from tmlqcd_tpu.lattice import Lattice  # noqa: E402,F401
