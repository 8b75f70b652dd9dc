"""On-init action validation: verify that every rational/polynomial
monomial's approximation interval [s_min, s_max] actually brackets the
spectrum of its squared operator on the starting gauge configuration.

Reference: the Jacobi-Davidson eigenvalue check run at ndrat/phmc init
(survey §2.6/§2.7 StildeMin/StildeMax) — a mis-bracketed interval silently
corrupts the exactness of the rational heatbath, so the reference measures
spec(Q^2) and aborts/warns when the user-supplied interval fails to cover
it.  Here `solvers.eigen.spectral_bounds` (power + inverse iteration)
supplies the estimates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

__all__ = ["IntervalCheck", "check_rational_intervals"]


class IntervalCheck(NamedTuple):
    name: str
    s_min: float
    s_max: float
    lambda_min: float
    lambda_max: float
    ok: bool


def _q2_matvec(mono, u):
    """(matvec on Q^2, field shape) for a rational/polynomial monomial."""
    from tmlqcd_tpu.hmc.poly_monomials import NDPolyMonomial
    from tmlqcd_tpu.hmc.rational_monomials import NDRatMonomial, RatMonomial

    if isinstance(mono, NDPolyMonomial):
        return (lambda x: mono._q2(u, x)), (2, 4, 3) + mono.lat.eo_site_shape
    if isinstance(mono, NDRatMonomial):  # covers NDRatCor
        return (
            lambda x: mono._q(u, mono._q(u, x)),
            (2, 4, 3) + mono.lat.eo_site_shape,
        )
    if isinstance(mono, RatMonomial):  # covers RatCor
        # RatMonomial._q applies Qhat(sign); A = Qhat_- Qhat_+
        return (
            lambda x: mono._q(u, mono._q(u, x, +1.0), -1.0),
            (4, 3) + mono.lat.eo_site_shape,
        )
    return None, None


def check_rational_intervals(
    hmc_cfg, u, key=None, strict: bool = False, verbose: bool = True
) -> list[IntervalCheck]:
    """Estimate spec(Q^2) for every monomial carrying an approximation
    interval and compare against [s_min, s_max].  strict=True raises on a
    violation (the reference aborts); otherwise a warning is printed.
    Run once per job at init / after loading the starting configuration."""
    from tmlqcd_tpu.solvers.eigen import spectral_bounds

    if key is None:
        key = jax.random.key(97)
    out: list[IntervalCheck] = []
    for i, m in enumerate(getattr(hmc_cfg, "monomials", hmc_cfg)):
        if not (hasattr(m, "s_min") and hasattr(m, "s_max")):
            continue
        mv, shape = _q2_matvec(m, u)
        if mv is None:
            continue
        lmin, lmax = jax.jit(
            lambda u_, k_: spectral_bounds(mv, shape, k_, safety=1.0)
        )(u, jax.random.fold_in(key, i))
        lmin, lmax = float(lmin), float(lmax)
        ok = (m.s_min <= lmin) and (lmax <= m.s_max)
        out.append(IntervalCheck(m.name, m.s_min, m.s_max, lmin, lmax, ok))
        if not ok:
            msg = (
                f"monomial {m.name}: spec(Q^2) ~ [{lmin:.3e}, {lmax:.3e}] NOT "
                f"bracketed by [StildeMin, StildeMax] = [{m.s_min:.3e}, "
                f"{m.s_max:.3e}] — the rational/polynomial approximation is "
                f"invalid there (reference: ndrat init eigenvalue check)"
            )
            if strict:
                raise ValueError(msg)
            print(f"[validate] WARNING: {msg}")
        elif verbose:
            print(
                f"[validate] {m.name}: spec(Q^2) ~ [{lmin:.3e}, {lmax:.3e}] "
                f"within [{m.s_min:.3e}, {m.s_max:.3e}] ok"
            )
    return out
