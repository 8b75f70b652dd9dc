"""Wilson (gradient) flow with Luscher's 3-stage Runge-Kutta integrator,
energy densities E(t), and the t0 / w0 scales.

Reference: meas/gradient_flow.c `gradient_flow_measurement` (survey §2.9):
Wilson flow, RK3 Luscher integrator, outputs t^2 E(t), t0/w0.

Flow equation (Luscher 1006.4518): V' = Z(V) V.  In this package's force
convention F = TA(U dS/dU^T) (satisfying dS/d_eps = tr(F P) along
dU = eps P U, with tr negative-definite on antihermitian matrices so F is
already the descent direction), the Wilson-flow generator is exactly
Z(V) = gauge_force(V, beta=1) — the normalization is CALIBRATED against
the linearized decay exp(-t phat^2) of a transverse plane wave
(tests/test_meas.py::test_flow_free_field_decay pins it to 2%).

RK3 (Luscher appendix C):
    W0 = V
    W1 = exp(1/4 Z0) W0
    W2 = exp(8/9 Z1 - 17/36 Z0) W1
    V' = exp(3/4 Z2 - 8/9 Z1 + 17/36 Z0) W2,   Zi = eps Z(Wi)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tmlqcd_tpu import su3
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops.clover import PLANES, field_strength
from tmlqcd_tpu.ops.gauge_action import gauge_force, plaquette_field

__all__ = ["wilson_flow_step", "wilson_flow", "energy_plaq", "energy_clover", "t0_scale", "FlowResult"]


def _z(v: jax.Array, lat: Lattice) -> jax.Array:
    """Flow generator Z(V) = +gauge_force(V, beta=3).

    Sign note: F = TA(U dS/dU^T) satisfies dS/d_eps = tr(F P) along
    dU = eps P U, and tr(A B) is NEGATIVE-definite on antihermitian
    matrices — F itself is the descent direction: dS/dt = tr(F F) < 0.
    The beta = 3 normalization is CALIBRATED against the exact linearized
    Wilson-flow decay exp(-t phat^2) of a transverse plane wave (pinned to
    2% by tests/test_meas.py::test_flow_free_field_decay — with this module's
    ta_project and single-counted (mu<nu) plaquette sum, the measured
    generator on an abelian mode is f_Lambda = -(beta/3) phat^2 theta).
    """
    return gauge_force(v, 3.0, lat, 0.0)


def wilson_flow_step(v: jax.Array, eps: float, lat: Lattice) -> jax.Array:
    """One RK3 step of flow time eps (reference: the fixed-step integrator
    of gradient_flow.c)."""
    z0 = eps * _z(v, lat)
    w1 = su3.mul(su3.expm_ta(0.25 * z0), v)
    z1 = eps * _z(w1, lat)
    w2 = su3.mul(su3.expm_ta((8.0 / 9.0) * z1 - (17.0 / 36.0) * z0), w1)
    z2 = eps * _z(w2, lat)
    v3 = su3.mul(su3.expm_ta(0.75 * z2 - (8.0 / 9.0) * z1 + (17.0 / 36.0) * z0), w2)
    return su3.project_su3(v3)


def energy_plaq(v: jax.Array, lat: Lattice) -> jax.Array:
    """Plaquette discretization of the energy density
    E = 2 sum_{mu<nu} Re tr(1 - P_munu) / V (f64)."""
    acc = jnp.asarray(0.0, jnp.float64)
    for mu in range(4):
        for nu in range(mu + 1, 4):
            tr = su3.re_trace(plaquette_field(v, mu, nu, lat))
            acc = acc + jnp.sum((3.0 - tr).astype(jnp.float64))
    return 2.0 * acc / lat.volume


def energy_clover(v: jax.Array, lat: Lattice) -> jax.Array:
    """Clover (field-strength) discretization E = sum_{mu<nu} tr(G G) / V —
    the smoother discretization the reference also reports."""
    gs = field_strength(v, lat)
    acc = jnp.asarray(0.0, jnp.float64)
    for g in gs:
        # tr(G G) for hermitian G = sum |G_ij|^2
        acc = acc + jnp.sum(
            (g.real.astype(jnp.float64) ** 2 + g.imag.astype(jnp.float64) ** 2)
        )
    return acc / lat.volume


class FlowResult(NamedTuple):
    times: jax.Array  # [n] flow times
    t2e_plaq: jax.Array  # [n] t^2 E_plaq(t)
    t2e_clover: jax.Array  # [n] t^2 E_clover(t)
    v: jax.Array  # flowed field at the final time


def wilson_flow(v: jax.Array, lat: Lattice, eps: float = 0.02, n_steps: int = 50) -> FlowResult:
    """Flow to t = eps*n_steps, recording t^2 E(t) each step — the
    gradient-flow measurement (one lax.scan; fully jittable)."""

    def body(carry, i):
        v = carry
        v = wilson_flow_step(v, eps, lat)
        t = (i + 1.0) * eps
        return v, (t, t * t * energy_plaq(v, lat), t * t * energy_clover(v, lat))

    v_out, (times, e_p, e_c) = jax.lax.scan(body, v, jnp.arange(n_steps, dtype=jnp.float64))
    return FlowResult(times=times, t2e_plaq=e_p, t2e_clover=e_c, v=v_out)


def t0_scale(times, t2e, target: float = 0.3) -> float:
    """t0: the flow time where t^2 E(t) = target (linear interpolation;
    reference: the t0/w0 scale-setting outputs)."""
    import numpy as np

    times = np.asarray(times)
    vals = np.asarray(t2e)
    above = np.nonzero(vals >= target)[0]
    if len(above) == 0:
        return float("nan")
    i = above[0]
    if i == 0:
        return float(times[0])
    t1, t2 = times[i - 1], times[i]
    v1, v2 = vals[i - 1], vals[i]
    return float(t1 + (target - v1) * (t2 - t1) / (v2 - v1))


def wilson_flow_adaptive(
    v: jax.Array,
    lat: Lattice,
    t_max: float,
    eps0: float = 0.01,
    tol: float = 1e-6,
    max_steps: int = 2000,
):
    """Adaptive-step Wilson flow (reference: gradient_flow.c's adaptive
    mode): step-doubling error control — one eps-step vs two eps/2-steps,
    distance || . ||_inf on the links estimates the local error; step
    accepted if err < tol, eps adapted by the RK3 order-3 rule.

    Runs as a host-side loop (flow measurements are offline analysis, not
    MD-critical); returns (flowed field, times, t2E_plaq samples).
    """
    import numpy as np

    step2 = jax.jit(lambda u, e: wilson_flow_step(wilson_flow_step(u, e / 2.0, lat), e / 2.0, lat))
    step1 = jax.jit(lambda u, e: wilson_flow_step(u, e, lat))
    e_fn = jax.jit(lambda u: energy_plaq(u, lat))

    t, eps = 0.0, float(eps0)
    times, t2e = [], []
    for _ in range(max_steps):
        if t >= t_max:
            break
        eps = min(eps, t_max - t)
        u1 = step1(v, eps)
        u2 = step2(v, eps)
        err = float(jnp.max(jnp.abs(u1 - u2)))
        if err < tol or eps <= 1e-6:
            v = u2
            t += eps
            times.append(t)
            t2e.append(t * t * float(e_fn(v)))
        # order-3 local error -> adapt with exponent 1/3 (safety 0.9)
        eps = eps * min(2.0, max(0.2, 0.9 * (tol / max(err, 1e-300)) ** (1.0 / 3.0)))
    return v, np.asarray(times), np.asarray(t2e)
