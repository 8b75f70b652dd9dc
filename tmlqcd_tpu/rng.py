"""Reproducible, decomposition-independent random numbers.

Reference: ranlxd.c/ranlxs.c (Luscher RANLUX) + start.c site-ordered draws under
`reproduce_randomnumber_flag`, which make results independent of the MPI
decomposition.  The TPU-native equivalent is *free*: JAX's threefry is
counter-based and partitionable, so a single `normal(key, global_shape)` draw
is bitwise identical regardless of how the output array is sharded.  Keys are
derived deterministically from (seed, trajectory, purpose), so the whole Markov
chain is a pure function of the seed — and checkpointing RNG state is just
storing the integer trajectory counter + seed (reference: `rlxd_get`/
`rlxd_reset` state blobs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fold", "normal_spinor", "z2_spinor", "uniform"]


def fold(key: jax.Array, *data: int) -> jax.Array:
    """Derive a subkey from integer tags (trajectory number, purpose id...)."""
    for d in data:
        key = jax.random.fold_in(key, d)
    return key


def normal_spinor(key: jax.Array, shape: tuple, dtype=jnp.complex64) -> jax.Array:
    """Complex gaussian spinor field with <eta^+ eta> = 1 per complex component
    (reference: start.c `random_spinor_field_eo` gaussian mode)."""
    # NOTE: complex values are built with lax.complex, never `1j * x`: a bare
    # Python 1j stages a complex128 constant under x64, and C128 is not
    # supported on TPU (fails even as an intermediate in eager ops).
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    kr, ki = jax.random.split(key)
    s = jnp.asarray(0.7071067811865476, rdtype)  # 1/sqrt(2)
    return jax.lax.complex(
        jax.random.normal(kr, shape, rdtype) * s,
        jax.random.normal(ki, shape, rdtype) * s,
    ).astype(dtype)


def z2_spinor(key: jax.Array, shape: tuple, dtype=jnp.complex64) -> jax.Array:
    """Z2 x Z2 noise source, components (+-1 +- i)/sqrt(2)
    (reference: source_generation.c stochastic timeslice sources)."""
    kr, ki = jax.random.split(key)
    s = jnp.asarray(0.7071067811865476, jnp.float32)
    re = jax.random.rademacher(kr, shape, jnp.float32) * s
    im = jax.random.rademacher(ki, shape, jnp.float32) * s
    return jax.lax.complex(re, im).astype(dtype)


def uniform(key: jax.Array) -> jax.Array:
    """Scalar uniform [0,1) for the Metropolis decision (reference: rank-0
    `ranlxd` draw + MPI_Bcast in update_tm.c — here a replicated scalar)."""
    return jax.random.uniform(key, (), jnp.float32)
