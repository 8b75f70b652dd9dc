"""Online meson correlators: stochastic-source <PP> and <PA> time
correlators measured inside the HMC loop.

Reference: meas/correlators.c `correlators_measurement` (survey §3.5) —
one Z2 timeslice source, one inversion, contraction to C(t), written to
`onlinemeas.NNNNNN`.  The pion mass m_PS comes from an exponential/cosh fit
offline; `effective_mass` provides the standard cosh-effective-mass for
quick monitoring.

Physics: with a stochastic timeslice source eta at t0 and psi = M^{-1} eta,

    C_PP(t) = sum_x |psi(x, t0+t)|^2            (gamma5-trick: the conj
    propagator leg is free via gamma5-hermiticity of the twisted pair)
    C_PA(t) = sum_x Re/Im[psi^+ gamma0 gamma5 psi] analog (reference keeps
    <P A_0> for the PCAC mass; implemented as g0g5 insertion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu.gamma import GAMMA, GAMMA5
from tmlqcd_tpu.inverter import invert_eo
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.meas.sources import z2_timeslice_source
from tmlqcd_tpu.ops.wilson import DiracParams

__all__ = ["pion_correlator", "online_measurement", "effective_mass", "pion_norm"]


def _spin_matrix_insert(psi: jax.Array, m: np.ndarray) -> jax.Array:
    """(m psi) on the spin axis with trace-time constants (no dot_general —
    see tmlqcd_tpu.su3.mul layout note)."""
    out = []
    for a in range(4):
        acc = None
        for s in range(4):
            z = m[a, s]
            if z == 0.0:
                continue
            term = jnp.asarray(z, psi.dtype) * psi[s]
            acc = term if acc is None else acc + term
        out.append(acc if acc is not None else jnp.zeros_like(psi[0]))
    return jnp.stack(out)


def pion_correlator(psi: jax.Array, lat: Lattice, t0: int = 0) -> jax.Array:
    """C_PP(t) [T] f64 from a propagator solve psi = M^{-1} eta, shifted so
    index 0 is the source timeslice."""
    dens = jnp.sum(
        psi.real.astype(jnp.float64) ** 2 + psi.imag.astype(jnp.float64) ** 2,
        axis=(0, 1, 3, 4),
    )  # [T]
    return jnp.roll(dens, -t0)


def pa_correlator(psi: jax.Array, lat: Lattice, t0: int = 0) -> jax.Array:
    """C_PA0(t) [T] f64: insertion of gamma0 gamma5 on the sink
    (reference: the <PA> column of onlinemeas; PCAC mass input).

    gamma0 gamma5 is ANTI-hermitian, so psi^+ (g0 g5) psi is purely
    imaginary — the physical correlator is its imaginary part (the real
    part vanishes identically; the reference's <PA> for the twisted pair
    carries the same i)."""
    g0g5 = GAMMA[0] @ GAMMA5
    gpsi = _spin_matrix_insert(psi, g0g5)
    corr = jnp.sum(
        (jnp.conj(psi) * gpsi).imag.astype(jnp.float64), axis=(0, 1, 3, 4)
    )
    return jnp.roll(corr, -t0)


def online_measurement(
    u: jax.Array,
    params: DiracParams,
    lat: Lattice,
    key: jax.Array,
    t0: int | None = None,
    tol: float = 1e-10,
    maxiter: int = 5000,
):
    """One online measurement (reference: correlators_measurement):
    random timeslice Z2 source -> invert -> (C_PP [T], C_PA [T], t0).

    The whole source->invert->contract pipeline runs as ONE jitted program
    (eager op chains are both slow and fragile on the remote-TPU path)."""
    import functools

    if t0 is None:
        t0 = int(jax.random.randint(key, (), 0, lat.dims[0]))

    @functools.partial(jax.jit, static_argnums=(2,))
    def _run(u, key, t0_static):
        src = z2_timeslice_source(lat, t0_static, jax.random.fold_in(key, 1), u.dtype)
        res = invert_eo(u, src, params, lat, tol=tol, maxiter=maxiter)
        norm = 1.0 / (lat.volume / lat.dims[0])
        return (
            pion_correlator(res.x, lat, t0_static) * norm,
            pa_correlator(res.x, lat, t0_static) * norm,
        )

    cpp, cpa = _run(u, key, t0)
    return cpp, cpa, t0


def pion_norm(
    u: jax.Array,
    params: DiracParams,
    lat: Lattice,
    key: jax.Array,
    tol: float = 1e-10,
    maxiter: int = 5000,
) -> jax.Array:
    """Per-timeslice pion norm |G(t)|^2 from a VOLUME Z2 source (reference:
    meas/pion_norm.c — the PIONNORM online measurement; the Gibbs-like
    estimator of the zero-momentum pion propagator used for quick m_PS /
    thermalization monitoring).  One e/o-preconditioned solve; normalized
    by the spatial volume.  Returns C(t) [T] f64."""
    from tmlqcd_tpu.meas.sources import volume_source

    @jax.jit
    def _run(u, key):
        src = volume_source(lat, key, u.dtype)
        res = invert_eo(u, src, params, lat, tol=tol, maxiter=maxiter)
        return pion_correlator(res.x, lat, 0) / (lat.volume / lat.dims[0])

    return _run(u, key)


def effective_mass(corr: np.ndarray) -> np.ndarray:
    """Cosh effective mass am_eff(t) solving
    C(t-1)/C(t+1) = cosh(m(t-1-T/2))/cosh(m(t+1-T/2)) by bisection — the
    standard quick-look for onlinemeas output."""
    corr = np.asarray(corr, np.float64)
    t_ext = len(corr)
    half = t_ext // 2
    out = np.full(t_ext, np.nan)
    for t in range(1, t_ext - 1):
        ratio = corr[t - 1] / corr[t + 1] if corr[t + 1] != 0 else np.nan
        if not np.isfinite(ratio) or ratio <= 1.0:
            continue
        lo, hi = 1e-8, 10.0
        f = lambda m: np.cosh(m * (t - 1 - half)) / np.cosh(m * (t + 1 - half)) - ratio
        if f(lo) * f(hi) > 0:
            continue
        for _ in range(100):
            mid = 0.5 * (lo + hi)
            if f(lo) * f(mid) <= 0:
                hi = mid
            else:
                lo = mid
        out[t] = 0.5 * (lo + hi)
    return out
