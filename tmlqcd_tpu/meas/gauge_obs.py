"""Gauge observables: Polyakov loops and oriented plaquettes.

Reference: polyakov_loop.c (`polyakov_loop`), meas/oriented_plaquettes.c —
survey §2.9.  (Average plaquette/rectangle live in ops/gauge_action.py, the
xlf-info plaquette record.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tmlqcd_tpu import su3
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops.gauge_action import plaquette_field

__all__ = [
    "polyakov_loop",
    "oriented_plaquettes",
    "topological_charge",
    "field_strength_observables",
]


def polyakov_loop(u: jax.Array, lat: Lattice, direction: int = 0) -> jax.Array:
    """Volume-averaged Polyakov loop <(1/3) tr prod_t U_dir(x)> (complex
    scalar; reference: polyakov_loop.c, also supports spatial directions).

    The ordered product along the `direction` axis is a lax.scan over link
    slices (log-depth would need matmul associativity scans; the extent is
    small, a linear scan is fine and exact)."""
    # bring the loop axis to front of site dims: u[:, :, dir] is [3,3,T,X,M]
    links = u[:, :, direction]
    site_axis = {0: 2, 1: 3, 2: None, 3: None}[direction]
    if direction >= 2:
        # y/z live flattened in the minor axis; reshape to expose them
        t, x, y, z = lat.dims
        links = links.reshape(3, 3, t, x, y, z)
        site_axis = 4 if direction == 2 else 5
    n = links.shape[site_axis]
    slices = jnp.moveaxis(links, site_axis, 2)  # [3,3,n,...rest]

    def body(carry, ls):
        return su3.mul(carry, ls), None

    eye = jnp.broadcast_to(
        jnp.eye(3, dtype=u.dtype).reshape((3, 3) + (1,) * (slices.ndim - 3)),
        slices.shape[:2] + slices.shape[3:],
    )
    prod, _ = jax.lax.scan(body, eye, jnp.moveaxis(slices, 2, 0))
    tr = su3.trace(prod) / 3.0
    return jnp.mean(tr.astype(jnp.complex128))


def oriented_plaquettes(u: jax.Array, lat: Lattice) -> jax.Array:
    """Per-plane plaquette averages [6] in plane order
    (01, 02, 03, 12, 13, 23) (reference: meas/oriented_plaquettes.c)."""
    vals = []
    for mu in range(4):
        for nu in range(mu + 1, 4):
            tr = su3.re_trace(plaquette_field(u, mu, nu, lat))
            vals.append(jnp.mean(tr.astype(jnp.float64)) / 3.0)
    return jnp.stack(vals)


def topological_charge(u: jax.Array, lat: Lattice) -> jax.Array:
    """Field-theoretic topological charge from the clover field strength:
    Q = 1/(32 pi^2) sum_x eps_{munurhosigma} tr[G_munu G_rhosigma]
      = 1/(4 pi^2)  sum_x Re tr[G_01 G_23 - G_02 G_13 + G_03 G_12]
    (reference: meas/measure_clover_field_strength_observables.c — the
    unsmoothed clover-definition charge; measure after gradient flow for
    near-integer values)."""
    import numpy as np

    from tmlqcd_tpu.ops.clover import PLANES, field_strength

    gs = field_strength(u, lat)
    i = {pl: k for k, pl in enumerate(PLANES)}
    pairs = [((0, 1), (2, 3), +1.0), ((0, 2), (1, 3), -1.0), ((0, 3), (1, 2), +1.0)]
    q = jnp.asarray(0.0, jnp.float64)
    for a, b, sgn in pairs:
        tr = su3.trace(su3.mul(gs[i[a]], gs[i[b]]))
        q = q + sgn * jnp.sum(tr.real.astype(jnp.float64))
    return q / (4.0 * np.pi**2)


def field_strength_observables(u: jax.Array, lat: Lattice):
    """(E_plaq, E_clover, Q): gauge energy in both discretizations plus the
    clover topological charge at flow time zero (reference:
    measure_clover_field_strength_observables.c's measurement record)."""
    from tmlqcd_tpu.meas.gradient_flow import energy_clover, energy_plaq

    return energy_plaq(u, lat), energy_clover(u, lat), topological_charge(u, lat)
