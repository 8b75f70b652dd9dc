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
    """One timescale: scheme 'leapfrog' | '2mn' | '2mnposition', n_steps
    sub-steps (reference: integrator.c per-scale type
    {LEAPFROG, 2MN, 2MNPOSITION})."""

    scheme: str = "2mn"
    steps: int = 1

    def __post_init__(self):
        if self.scheme not in ("leapfrog", "2mn", "2mnposition"):
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


def _expand_schedule(cfg: IntegratorConfig, timescales) -> tuple:
    """Symbolically execute the recursive multi-timescale scheme into a FLAT
    static schedule: S+1 per-monomial kick-coefficient vectors interleaved
    with S drift steps (the last drift is 0).

    The recursion (reference: integrator.c — scale i does n_int[i] steps,
    each advancing scale i-1 over the sub-interval, with adjacent momentum
    kicks at step boundaries FUSED) produces a strict kick/drift alternation
    once (a) each level's boundary kicks are merged and (b) kicks of
    DIFFERENT levels that meet at a level boundary are summed into one
    per-monomial coefficient vector.  Returns (kick_coeffs [S+1, nm] f64,
    drift_dts [S+1] f64) with drift_dts[-1] == 0.
    """
    import numpy as np

    nm = len(timescales)
    events: list = []  # ('kick', lvl, coeff) | ('drift', dt)

    def rec_level(lvl: int, t: float):
        n = cfg.levels[lvl].steps
        dt = t / n
        scheme = cfg.levels[lvl].scheme
        lam = LAMBDA_2MN
        # items: strict alternation of ('k', coeff) momentum kicks and
        # ('a', sub_dt) position advances over the level's interval, with
        # boundary terms between adjacent sub-steps already merged.
        if scheme == "leapfrog":
            kicks = np.full(n + 1, dt)
            kicks[0] = kicks[-1] = 0.5 * dt
            items = []
            for i, c in enumerate(kicks):
                items.append(("k", float(c)))
                if i < n:
                    items.append(("a", dt))
        elif scheme == "2mn":
            kicks = np.empty(2 * n + 1)
            kicks[0::2] = 2.0 * lam * dt
            kicks[1::2] = (1.0 - 2.0 * lam) * dt
            kicks[0] = kicks[-1] = lam * dt
            items = []
            for i, c in enumerate(kicks):
                items.append(("k", float(c)))
                if i < 2 * n:
                    items.append(("a", 0.5 * dt))
        else:  # 2mnposition: the position version starts/ends with a drift
            advs = np.empty(2 * n + 1)
            advs[0::2] = 2.0 * lam * dt
            advs[1::2] = (1.0 - 2.0 * lam) * dt
            advs[0] = advs[-1] = lam * dt
            items = []
            for i, a in enumerate(advs):
                items.append(("a", float(a)))
                if i < 2 * n:
                    items.append(("k", 0.5 * dt))
        for kind, val in items:
            if kind == "k":
                events.append(("kick", lvl, val))
            elif lvl == 0:
                events.append(("drift", val))
            else:
                rec_level(lvl - 1, val)

    rec_level(len(cfg.levels) - 1, cfg.tau)

    kick_rows: list = []
    drift_dts: list = []
    cur = np.zeros(nm)
    for ev in events:
        if ev[0] == "kick":
            _, lvl, c = ev
            for i, ts in enumerate(timescales):
                if ts == lvl:
                    cur[i] += c
        else:
            _, dt = ev
            if not cur.any() and drift_dts:
                # empty timescale: no kick between two drifts — merge them
                drift_dts[-1] += dt
            else:
                kick_rows.append(cur)
                drift_dts.append(dt)
                cur = np.zeros(nm)
    kick_rows.append(cur)
    drift_dts.append(0.0)
    return np.stack(kick_rows), np.asarray(drift_dts)


def integrate(cfg: IntegratorConfig, monomials, aux_list, u, p, chrono=None,
              freeze_mask=None):
    """Run one MD trajectory of length cfg.tau.

    `freeze_mask` (optional, [4,T,X,Y*Z] 0/1): entries with mask 0 are
    Dirichlet-frozen dofs (Schrödinger functional): the drift restores them
    bit-exactly after reunitarization (the masked momenta keep them
    stationary up to project_su3 rounding; the restore removes even that).

    `monomials` is the static list; `aux_list` the per-monomial pseudofermion
    state (from heatbath), both closed over.

    `chrono` (optional) is a tuple of per-monomial ChronoHistory (or None)
    entries; when given, kicks call `force_chrono(u, aux, hist)` so every
    force solve starts from the chronological guess and pushes its solution
    (reference: chrono_guess.c called from the derivativefunctions, survey
    §2.6 "Big HMC speedup"), and the return value is
    (u', p', chrono', force_iterations[n_monomials]).  Without `chrono`, the
    scan carry is just (u, p) and the return is (u', p').

    COMPILE-TIME DESIGN: the multi-timescale recursion is expanded into a
    flat static (kick-vector, drift) schedule and run as ONE lax.scan whose
    body traces each monomial's force exactly ONCE behind a lax.cond (the
    coefficient row selects which forces fire at runtime).  The recursive
    formulation instantiated every force graph at 2 call sites per level —
    on big actions that multiplied XLA compile time by ~the level count
    (measured: a 2-level GAUGE+CLOVERDETRATIO+NDRAT trajectory's HLO shrank
    1.55x from this change alone, on top of the compact-algebra CPU paths).
    """

    import jax.numpy as jnp

    for m in monomials:
        if m.timescale >= len(cfg.levels):
            raise ValueError(
                f"monomial {m.name} on timescale {m.timescale} but only "
                f"{len(cfg.levels)} integrator levels configured"
            )

    with_chrono = chrono is not None
    nm = len(monomials)

    kick_rows, drift_dts = _expand_schedule(
        cfg, tuple(m.timescale for m in monomials)
    )
    # f32 scalars: a weak f64 coefficient would promote the c64 momentum
    # update to complex128 (unsupported on TPU)
    kc = jnp.asarray(kick_rows, jnp.float32)
    dd = jnp.asarray(drift_dts, jnp.float32)

    ch0 = chrono if with_chrono else tuple(None for _ in monomials)
    its0 = jnp.zeros((nm,), jnp.int32)

    def kick(coeffs, u, p, ch, its):
        """p += 0.5 * sum_i coeffs[i] F_i(u); each force behind a cond so a
        zero coefficient skips the solve at runtime."""
        f = jnp.zeros_like(p)
        for i, m in enumerate(monomials):
            use_chrono = with_chrono and ch[i] is not None and hasattr(m, "force_chrono")

            if use_chrono:
                def live(u=u, i=i, m=m, hist=ch[i]):
                    return m.force_chrono(u, aux_list[i], hist)

                def skip(u=u, i=i, hist=ch[i]):
                    return jnp.zeros_like(u), hist, jnp.asarray(0, jnp.int32)

                fi, hi, ki = jax.lax.cond(coeffs[i] != 0.0, live, skip)
                ch = ch[:i] + (hi,) + ch[i + 1:]
                its = its.at[i].add(ki)
            elif hasattr(m, "force_info"):
                # solver-backed forces without chrono (rational/multishift
                # monomials): surface the MD solve iteration count
                # (reference: output.data per-monomial solver iterations,
                # survey §5.5)
                def live_fi(u=u, i=i, m=m):
                    fi_, ki_ = m.force_info(u, aux_list[i])
                    return fi_, jnp.asarray(ki_, jnp.int32)

                def skip_fi(u=u):
                    return jnp.zeros_like(u), jnp.asarray(0, jnp.int32)

                fi, ki = jax.lax.cond(coeffs[i] != 0.0, live_fi, skip_fi)
                its = its.at[i].add(ki)
            else:
                fi = jax.lax.cond(
                    coeffs[i] != 0.0,
                    lambda u=u, i=i, m=m: m.force(u, aux_list[i]),
                    lambda u=u: jnp.zeros_like(u),
                )
            f = f + coeffs[i] * fi
        return p + 0.5 * f, ch, its

    def drift(eps, u, p):
        unew = su3.mul(su3.expm_ta(eps * p), u)
        if cfg.reunitarize_every == 1:
            unew = su3.project_su3(unew)
        if freeze_mask is not None:
            unew = jnp.where(freeze_mask == 0.0, u, unew)
        return unew

    def body(carry, xs):
        u, p, ch, its = carry
        coeffs, dt = xs
        p, ch, its = kick(coeffs, u, p, ch, its)
        # the final schedule row has dt == 0: skip the drift (and its
        # reunitarization) so the endpoint matches the recursive scheme
        u = jax.lax.cond(dt != 0.0, lambda: drift(dt, u, p), lambda: u)
        return (u, p, ch, its), None

    (u, p, ch, its), _ = jax.lax.scan(body, (u, p, ch0, its0), (kc, dd))
    if with_chrono:
        return u, p, ch, its
    return u, p
