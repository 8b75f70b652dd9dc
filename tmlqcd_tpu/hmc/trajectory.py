"""One HMC trajectory: momentum heatbath, pseudofermion heatbaths, MD
integration, Metropolis accept/reject — plus the reversibility self-check.

Reference: update_tm.c `update_tm(...)` (survey §3.2 call stack).

TPU-native shape: the whole trajectory is a pure function
(U, key) -> (U', stats), jittable and shardable; the Metropolis decision is a
replicated scalar (reference: rank-0 ranlxd draw + MPI_Bcast).  Parallel
chains are just `jax.vmap` of this function over a leading chain axis
(survey §2.11 "replica parallelism" — a genuine improvement on the reference,
which runs chains as separate jobs).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.hmc.integrators import IntegratorConfig, integrate
from tmlqcd_tpu.ops.gauge_action import plaquette

__all__ = ["HMCConfig", "TrajectoryStats", "hmc_trajectory", "reversibility_check",
           "chrono_states"]


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    """Static configuration of the sampler: lattice + action (monomial list) +
    integrator. Monomials carry their own solver settings."""

    lat: object
    monomials: tuple
    integrator: IntegratorConfig
    # Optional [4,T,X,Y*Z] 0/1 momenta mask (Schrödinger functional: zero on
    # the Dirichlet-frozen dofs so they carry no kinetic term and never
    # drift; see ops.sf.sf_momenta_mask).  None = all links dynamical.
    momenta_mask: Any = None


class TrajectoryStats(NamedTuple):
    """Per-trajectory observables — the output.data column contract
    (reference: survey §5.5: plaquette, dH, exp(-dH), accept flag,
    per-monomial acceptance-solve iteration counts)."""

    plaquette: jax.Array
    delta_h: jax.Array
    exp_mdh: jax.Array
    accepted: jax.Array
    h_old: jax.Array
    h_new: jax.Array
    acc_iterations: jax.Array  # [n_monomials] i32 (0 where no solve)
    force_iterations: jax.Array  # [n_monomials] i32 summed MD force-solve
    # iterations (0 for monomials without chrono-tracked solves)


def _heatbaths(cfg: HMCConfig, u, key):
    aux_list = []
    s_old = jnp.asarray(0.0, jnp.float64)
    for i, m in enumerate(cfg.monomials):
        aux, s0 = m.heatbath(u, rng.fold(key, 1000 + i))
        aux_list.append(aux)
        s_old = s_old + s0
    return aux_list, s_old


def _chrono_states(cfg: HMCConfig):
    """Per-monomial chronological-guess histories (None where unsupported
    or disabled) — the empty csg_field warm state of the reference.  Warm
    state only, never part of the Markov chain; pass the returned tuple as
    `hmc_trajectory(..., chrono=...)` to persist it across trajectories
    (reference: chrono_guess.c csg_field lifetime)."""
    return tuple(
        m.chrono_init_state() if hasattr(m, "chrono_init_state") else None
        for m in cfg.monomials
    )


chrono_states = _chrono_states


def hmc_trajectory(cfg: HMCConfig, u: jax.Array, key: jax.Array, chrono=None):
    """(U, key) -> (U', TrajectoryStats). Jit with cfg static:
    ``jax.jit(hmc_trajectory, static_argnums=0)`` or close over cfg.

    `chrono` (optional): per-monomial ChronoHistory tuple carried ACROSS
    trajectories by the caller (reference: the csg_field history lives in
    the monomial struct for the whole run, chrono_guess.c).  When given, the
    return value is (U', stats, chrono') with chrono' reset to empty on
    reject (the history's solutions belong to the rejected MD path's
    endpoint, not the restored gauge field).  Without it, the history is
    rebuilt fresh each trajectory and (U', stats) is returned."""
    k_mom, k_pf, k_acc = jax.random.split(key, 3)

    p = su3.random_momenta(k_mom, u.shape[2:], u.dtype)
    if cfg.momenta_mask is not None:
        p = p * cfg.momenta_mask
    aux_list, s_old = _heatbaths(cfg, u, k_pf)
    h_old = su3.kinetic_energy(p) + s_old

    ch0 = _chrono_states(cfg) if chrono is None else chrono
    u_new, p_new, ch, force_iters = integrate(
        cfg.integrator, cfg.monomials, aux_list, u, p, chrono=ch0,
        freeze_mask=cfg.momenta_mask,
    )

    s_new = jnp.asarray(0.0, jnp.float64)
    iters = []
    for i, m in enumerate(cfg.monomials):
        if hasattr(m, "action_info"):
            if hasattr(m, "chrono_init_state"):
                # seed the acceptance solve with the MD-end chrono guess
                s_i, it_i = m.action_info(u_new, aux_list[i], ch[i])
            else:
                s_i, it_i = m.action_info(u_new, aux_list[i])
        else:
            s_i, it_i = m.action(u_new, aux_list[i]), jnp.asarray(0, jnp.int32)
        s_new = s_new + s_i
        iters.append(jnp.asarray(it_i, jnp.int32))
    h_new = su3.kinetic_energy(p_new) + s_new

    dh = h_new - h_old
    accept = rng.uniform(k_acc).astype(jnp.float64) < jnp.exp(-dh)
    u_out = jnp.where(accept, u_new, u)

    stats = TrajectoryStats(
        plaquette=plaquette(u_out, cfg.lat),
        delta_h=dh,
        exp_mdh=jnp.exp(-dh),
        accepted=accept,
        h_old=h_old,
        h_new=h_new,
        acc_iterations=jnp.stack(iters),
        force_iterations=force_iters,
    )
    if chrono is not None:
        fresh = _chrono_states(cfg)
        ch_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), ch, fresh
        )
        return u_out, stats, ch_out
    return u_out, stats


def reversibility_check(cfg: HMCConfig, u: jax.Array, key: jax.Array):
    """Integrate forward, flip momenta, integrate back; report |ddH| and the
    max gauge-field deviation (reference: update_tm.c `ReversibilityCheck`
    input / `return_check`)."""
    k_mom, k_pf = jax.random.split(key)
    p = su3.random_momenta(k_mom, u.shape[2:], u.dtype)
    if cfg.momenta_mask is not None:
        p = p * cfg.momenta_mask
    aux_list, s_old = _heatbaths(cfg, u, k_pf)
    h_old = su3.kinetic_energy(p) + s_old

    u1, p1 = integrate(cfg.integrator, cfg.monomials, aux_list, u, p,
                       freeze_mask=cfg.momenta_mask)
    u2, p2 = integrate(cfg.integrator, cfg.monomials, aux_list, u1, -p1,
                       freeze_mask=cfg.momenta_mask)

    s_back = jnp.asarray(0.0, jnp.float64)
    for i, m in enumerate(cfg.monomials):
        s_back = s_back + m.action(u2, aux_list[i])
    h_back = su3.kinetic_energy(p2) + s_back

    du = jnp.max(jnp.abs(u2 - u))
    return jnp.abs(h_back - h_old), du
