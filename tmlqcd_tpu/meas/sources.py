"""Source generation for propagator inversions and online measurements.

Reference: source_generation.c / prepare_source.c (point, timeslice-Z2,
volume, gaussian sources; input keys SourceType/SourceTimeslice/...),
survey §2.9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tmlqcd_tpu import rng
from tmlqcd_tpu.lattice import Lattice

__all__ = ["point_source", "z2_timeslice_source", "volume_source", "gaussian_timeslice_source"]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _point_source_jit(shape, spin, color, t, x, m, dtype=jnp.complex64):
    # built under jit: every input is static, and the eager complex
    # scatter/constant path is unimplemented over the axon TPU transport
    # (complex buffers cannot cross host<->device; on-device construction
    # inside a compiled program is fine).  Module-level jit so the 12
    # per-spin-color calls of the invert driver hit ONE cached executable
    # instead of retracing a fresh closure each call.
    src = jnp.zeros(shape, dtype)
    return src.at[spin, color, t, x, m].set(jnp.asarray(1.0, dtype))


def point_source(
    lat: Lattice, spin: int, color: int, site: tuple[int, int, int, int] = (0, 0, 0, 0),
    dtype=jnp.complex64,
) -> jax.Array:
    """delta source at (t,x,y,z) for one spin-color component
    (reference: source_generation.c point source per spin-color)."""
    t, x, y, z = site
    m = y * lat.dims[3] + z
    return _point_source_jit((4, 3) + lat.site_shape, spin, color, t, x, m, dtype)


def z2_timeslice_source(
    lat: Lattice, timeslice: int, key: jax.Array, dtype=jnp.complex64, spin_dilute: int | None = None
) -> jax.Array:
    """Z2xZ2 stochastic wall source on one timeslice (reference: the ONLINE
    measurement's source; optionally diluted to a single spin row)."""
    noise = rng.z2_spinor(key, (4, 3) + lat.site_shape, dtype)
    mask = jnp.zeros((lat.dims[0],), noise.real.dtype).at[timeslice].set(1.0)
    src = noise * mask.reshape(1, 1, -1, 1, 1)
    if spin_dilute is not None:
        smask = jnp.zeros((4,), noise.real.dtype).at[spin_dilute].set(1.0)
        src = src * smask.reshape(4, 1, 1, 1, 1)
    return src


def volume_source(lat: Lattice, key: jax.Array, dtype=jnp.complex64) -> jax.Array:
    """Z2 volume source (reference: volume sources for disconnected loops)."""
    return rng.z2_spinor(key, (4, 3) + lat.site_shape, dtype)


def gaussian_timeslice_source(
    lat: Lattice, timeslice: int, key: jax.Array, dtype=jnp.complex64
) -> jax.Array:
    """Gaussian stochastic wall source on one timeslice."""
    noise = rng.normal_spinor(key, (4, 3) + lat.site_shape, dtype)
    mask = jnp.zeros((lat.dims[0],), noise.real.dtype).at[timeslice].set(1.0)
    return noise * mask.reshape(1, 1, -1, 1, 1)
