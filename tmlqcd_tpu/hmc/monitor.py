"""Force monitoring: per-monomial force norms for timescale tuning.

Reference: monomial/monitor_forces.c + moment_energy.c (survey §2.7 "Force
monitoring" — "the tuning observability for timescale assignment —
reproduce on TPU day one").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tmlqcd_tpu import rng

__all__ = ["ForceStats", "monitor_forces"]


class ForceStats(NamedTuple):
    name: str
    timescale: int
    norm_sq: float  # sum_links |F|_F^2 (the reference's squared norm)
    max_abs: float  # max site Frobenius norm
    rms: float


def monitor_forces(cfg, u, key) -> list[ForceStats]:
    """Evaluate every monomial's force at U (fresh pseudofermion heatbaths)
    and report aggregate norms (reference: monitor_forces called from the
    hmc driver at DebugLevel >= 1)."""
    out = []
    n_links = 4 * u.shape[-3] * u.shape[-2] * u.shape[-1]
    for i, m in enumerate(cfg.monomials):
        aux, _ = m.heatbath(u, rng.fold(key, 5000 + i))
        f = m.force(u, aux)
        fro_sq = jnp.sum(jnp.abs(f) ** 2, axis=(0, 1))  # per link
        norm_sq = float(jnp.sum(fro_sq.astype(jnp.float64)))
        out.append(
            ForceStats(
                name=m.name,
                timescale=m.timescale,
                norm_sq=norm_sq,
                max_abs=float(jnp.sqrt(jnp.max(fro_sq))),
                rms=float((norm_sq / n_links) ** 0.5),
            )
        )
    return out
