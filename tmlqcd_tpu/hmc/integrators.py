"""Multi-timescale symplectic MD integrators: leapfrog and 2nd-order minimal
norm (Omelyan/2MN), recursively nested.

Reference: integrator.c — `Integrator` struct with per-timescale type
{LEAPFROG, 2MN}, `n_int[i]` sub-steps, recursion where scale i performs
n_int[i] steps each advancing scale i-1 over the sub-interval; update_gauge.c
(`U <- exp(dt P) U` + reunitarize) and update_momenta.c (force kicks).

Level 0 is the *finest* timescale (matching the reference's timescale
numbering: gauge on 0, expensive smooth fermion forces on coarser scales).
Each level's n steps are a `lax.scan` (compile once per level), with the full
sub-integration of finer levels nested inside the scan body.

MD force convention: for momenta P (traceless anti-hermitian), kinetic energy
E = sum tr(H^2) = |P|^2 (H = -iP), drift dU/dt = P U, and a monomial force
F = TA(U (dS/dU)^T) the equations of motion conserve
H iff dP/dt = F/2 — the 1/2 is absorbed into `kick` here.
"""

from __future__ import annotations

import dataclasses

import jax

from tmlqcd_tpu import su3

__all__ = ["Level", "IntegratorConfig", "integrate"]

# Omelyan 2MN constant (reference: integrator.c lambda default)
LAMBDA_2MN = 0.1931833275037836


@dataclasses.dataclass(frozen=True)
class Level:
    """One timescale: scheme 'leapfrog' or '2mn', n_steps sub-steps."""

    scheme: str = "2mn"
    steps: int = 1

    def __post_init__(self):
        if self.scheme not in ("leapfrog", "2mn"):
            raise ValueError(f"unknown scheme {self.scheme}")


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    """tau: trajectory length; levels[0] = finest timescale.

    Reference input keys: tau, NumberTimeScales, IntegrationSteps[i],
    per-scale integrator type (survey §5.6).
    """

    tau: float
    levels: tuple[Level, ...]
    reunitarize_every: int = 1  # project_su3 after every drift by default


def integrate(cfg: IntegratorConfig, monomials, aux_list, u, p):
    """Run one MD trajectory of length cfg.tau; returns (u', p').

    `monomials` is the static list; `aux_list` the per-monomial pseudofermion
    state (from heatbath), both closed over — the scan carry is just (u, p).
    """

    by_level = {
        lvl: [i for i, m in enumerate(monomials) if m.timescale == lvl]
        for lvl in range(len(cfg.levels))
    }
    for i, m in enumerate(monomials):
        if m.timescale >= len(cfg.levels):
            raise ValueError(
                f"monomial {m.name} on timescale {m.timescale} but only "
                f"{len(cfg.levels)} integrator levels configured"
            )

    def kick(lvl: int, eps: float, u, p):
        idx = by_level[lvl]
        if not idx:
            return p
        f = None
        for i in idx:
            fi = monomials[i].force(u, aux_list[i])
            f = fi if f is None else f + fi
        return p + (0.5 * eps) * f

    def drift(eps: float, u, p):
        unew = su3.mul(su3.expm_ta(eps * p), u)
        if cfg.reunitarize_every == 1:
            unew = su3.project_su3(unew)
        return unew

    def sub(lvl: int, t: float, u, p):
        """Advance all scales strictly finer than lvl over time t."""
        if lvl == 0:
            return drift(t, u, p), p
        return _level(lvl - 1, t, u, p)

    def _level(lvl: int, t: float, u, p):
        n = cfg.levels[lvl].steps
        dt = t / n
        scheme = cfg.levels[lvl].scheme

        if scheme == "leapfrog":

            def step(carry, _):
                u, p = carry
                p = kick(lvl, 0.5 * dt, u, p)
                u, p = sub(lvl, dt, u, p)
                p = kick(lvl, 0.5 * dt, u, p)
                return (u, p), None

        else:  # 2mn

            lam = LAMBDA_2MN

            def step(carry, _):
                u, p = carry
                p = kick(lvl, lam * dt, u, p)
                u, p = sub(lvl, 0.5 * dt, u, p)
                p = kick(lvl, (1.0 - 2.0 * lam) * dt, u, p)
                u, p = sub(lvl, 0.5 * dt, u, p)
                p = kick(lvl, lam * dt, u, p)
                return (u, p), None

        (u, p), _ = jax.lax.scan(step, (u, p), None, length=n)
        return u, p

    return _level(len(cfg.levels) - 1, cfg.tau, u, p)
