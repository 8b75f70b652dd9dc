"""Stochastic reweighting factors.

Reference: reweighting_factor.c / reweighting_factor_nd.c (survey §2.7):
stochastic estimates of determinant ratios — used to shift the twisted mass
after the fact and to correct the PHMC polynomial approximation error.

Identity: for complex gaussian eta (density ~ exp(-eta^+ eta)) and a
hermitian positive operator M,

    det(M)^{-1} = E[ exp( eta^+ (1 - M) eta ) ].

`stochastic_logdet_samples` returns the exponents s_i = eta_i^+ (1-M) eta_i;
callers combine them as mean(exp(s)) (and should inspect the spread — the
estimator degrades for large |log det|, reference behavior identical).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tmlqcd_tpu import rng
from tmlqcd_tpu.hmc.monomials import dot_re_f64, norm_sq_f64

__all__ = ["stochastic_logdet_samples", "mu_shift_reweighting"]


def stochastic_logdet_samples(
    apply_m: Callable, shape: tuple, key: jax.Array, n_samples: int = 12, dtype=jnp.complex64
) -> jax.Array:
    """[n] samples s_i with det(M)^{-1} = E[exp(s_i)]."""
    out = []
    for i in range(n_samples):
        eta = rng.normal_spinor(rng.fold(key, i), shape, dtype)
        s = norm_sq_f64(eta) - dot_re_f64(eta, apply_m(eta))
        out.append(s)
    return jnp.stack(out)


def mu_shift_reweighting(
    u,
    params_old,
    params_new,
    lat,
    key: jax.Array,
    n_samples: int = 12,
    tol: float = 1e-10,
    maxiter: int = 5000,
):
    """Samples for w = det(Qhat_pm(new)) / det(Qhat_pm(old)) — the
    two-flavor twisted-mass shift reweighting (reference:
    reweighting_factor.c with 2KappaMu reweighting input).

    M = Qpm(old)^{-1} Qpm(new); one CG solve per sample.
    """
    from tmlqcd_tpu.lattice import pack_gauge_eo
    from tmlqcd_tpu.ops import wilson as w
    from tmlqcd_tpu.solvers.cg import cg

    ueo = pack_gauge_eo(u, lat)
    ph_old = w.boundary_phases(params_old, lat)
    ph_new = w.boundary_phases(params_new, lat)

    def apply_m(eta):
        x = w.q_hat_pm(ueo, eta, params_new, lat, ph_new)
        return cg(
            lambda v: w.q_hat_pm(ueo, v, params_old, lat, ph_old),
            x,
            tol=tol,
            maxiter=maxiter,
        ).x

    shape = (4, 3) + lat.eo_site_shape
    return stochastic_logdet_samples(apply_m, shape, key, n_samples, u.dtype)
