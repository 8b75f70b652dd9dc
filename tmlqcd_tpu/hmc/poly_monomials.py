"""PHMC: polynomial pseudofermion monomial for the non-degenerate doublet.

Reference: monomial/ndpoly_monomial.c + chebyshev_polynomial_nd.c + phmc.c
(survey §2.7 "PHMC (polynomial)") — the older alternative to the rational
(NDRAT) monomial for the det(Q_nd^2)^{1/2} sector.

Formulation (exact detailed balance, TPU-native force):

    S = | P(Q^2) phi |^2,   P = Chebyshev approx of x^{-1/4} on [s_min, s_max]

so the sampled weight is det(P^2)^{-1} ~ det(Q^2)^{1/2}; the polynomial
approximation error is corrected by reweighting (reference: the Ptilde
correction/reweighting factor; tmlqcd_tpu.hmc.reweight).

  * heatbath: phi = P^{-1} eta via CG on the (well-conditioned) hermitian
    positive P^+P, giving S_0 = |eta|^2 exactly.
  * acceptance: one polynomial application.
  * force: AD straight through the rematerialized Clenshaw recursion
    (solvers.chebyshev) at stopped psi = P phi — NO inversions in the MD
    force at all, the structural advantage of PHMC the reference exploits.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu import rng
from tmlqcd_tpu.hmc.monomials import dot_re_f64, norm_sq_f64
from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import ndoublet as nd
from tmlqcd_tpu.ops.gauge_action import ta_force_from_grad
from tmlqcd_tpu.ops.wilson import boundary_phases
from tmlqcd_tpu.solvers.cg import cg
from tmlqcd_tpu.solvers.chebyshev import chebyshev_apply, chebyshev_coeffs, chebyshev_eval

__all__ = ["NDPolyMonomial"]


@dataclasses.dataclass(frozen=True)
class NDPolyMonomial:
    """Nf=1+1 polynomial monomial (reference: BeginMonomial NDPOLY with
    PolyDegree, PrecisionPtilde..., StildeMin/StildeMax)."""

    lat: Lattice
    params: nd.NDParams
    degree: int = 128  # ~3e-7 max rel err on [1e-2, 4] (rate exp(-d/sqrt(cond)))
    s_min: float = 1e-2
    s_max: float = 4.0
    timescale: int = 1
    heatbath_tol: float = 1e-10
    maxiter: int = 1000
    name: str = "ndpoly"

    @functools.cached_property
    def coeffs(self) -> np.ndarray:
        c = chebyshev_coeffs(lambda x: x**-0.25, self.degree, self.s_min, self.s_max)
        return c

    @property
    def max_rel_err(self) -> float:
        xs = np.geomspace(self.s_min, self.s_max, 4001)
        approx = chebyshev_eval(self.coeffs, xs, self.s_min, self.s_max)
        return float(np.max(np.abs(approx * xs**0.25 - 1.0)))

    def _q2(self, u, chi):
        ph = boundary_phases(self.params.wilson, self.lat)
        ueo = pack_gauge_eo(u, self.lat)
        if self.params.c_sw != 0.0:
            from tmlqcd_tpu.ops import clover as cl

            sw_e, sw_o = cl.sw_blocks_eo(u, self.params.kappa, self.params.c_sw, self.lat)
            q = lambda c: cl.q_nd_clover(ueo, sw_e, sw_o, c, self.params, self.lat, ph)
        else:
            q = lambda c: nd.q_nd(ueo, c, self.params, self.lat, ph)
        return q(q(chi))

    def _q2_fast_op(self, u):
        """Q_nd^2 on the split/Pallas path (clover via materialized blocks);
        Clenshaw's real-coefficient recursion runs unchanged on split
        arrays."""
        from tmlqcd_tpu.ops import wilson_fast as wf

        if self.params.c_sw != 0.0:
            fc = wf.make_fast_clover_nd(u, self.params, self.lat)
            return lambda c2: wf.q_nd_sq_clover_fast(fc, c2, self.params, self.lat)
        fg = wf.make_fast_gauge(u, self.params.wilson, self.lat)
        return lambda c2: wf.q_nd_sq_fast(fg, c2, self.params, self.lat)

    def _poly_on(self, q2, chi):
        return chebyshev_apply(q2, self.coeffs, chi, self.s_min, self.s_max)

    def _poly(self, u, chi):
        return self._poly_on(lambda c: self._q2(u, c), chi)

    def _use_fast(self) -> bool:
        # PHMC applies the polynomial with the UNSHARDED kernel (no solve to
        # amortize a sharded halo path); under an active mesh fall back to
        # the jnp operator, which GSPMD partitions cleanly
        from tmlqcd_tpu.hmc.monomials import _fast_unsharded

        return _fast_unsharded()

    def heatbath(self, u, key):
        eta = rng.normal_spinor(key, (2, 4, 3) + self.lat.eo_site_shape, u.dtype)
        # phi = P^{-1} eta: CG on P^2 (P hermitian positive on spec(Q^2))
        if self._use_fast():
            from tmlqcd_tpu.ops import dslash_pallas as dpl
            from tmlqcd_tpu.ops import wilson_fast as wf

            q2 = self._q2_fast_op(u)
            p2 = lambda x2: self._poly_on(q2, self._poly_on(q2, x2))
            rhs = self._poly_on(q2, wf.to_split(eta))
            phi2 = cg(p2, rhs, tol=self.heatbath_tol, maxiter=self.maxiter).x
            return dpl.merge_c(phi2, eta.dtype), norm_sq_f64(eta)
        p2 = lambda x: self._poly(u, self._poly(u, x))
        rhs = self._poly(u, eta)
        phi = cg(p2, rhs, tol=self.heatbath_tol, maxiter=self.maxiter).x
        return phi, norm_sq_f64(eta)

    def action(self, u, phi):
        if self._use_fast():
            from tmlqcd_tpu.ops import wilson_fast as wf

            psi2 = self._poly_on(self._q2_fast_op(u), wf.to_split(phi))
            return wf.dot_re_f64_split(psi2, psi2)
        psi = self._poly(u, phi)
        return norm_sq_f64(psi)

    def force(self, u, phi):
        if self.params.c_sw == 0.0 and self._use_fast():
            # forward pass AND the Clenshaw backward pass on the Pallas
            # kernels (hopping custom VJP) — no inversions, degree-many
            # rematerialized kernel applications
            from tmlqcd_tpu.ops import wilson_fast as wf

            phi2 = jax.lax.stop_gradient(wf.to_split(phi))
            psi2 = jax.lax.stop_gradient(
                self._poly_on(self._q2_fast_op(u), phi2)
            )

            def surrogate(uu):
                ug_e, ug_o = wf.split_gauge_pair(uu, self.params.wilson, self.lat)
                q2d = lambda c2: wf.q_nd_diff(
                    ug_e, ug_o, wf.q_nd_diff(ug_e, ug_o, c2, self.params, self.lat),
                    self.params, self.lat,
                )
                return 2.0 * wf.dot_re_f64_split(psi2, self._poly_on(q2d, phi2))

            g = jax.grad(surrogate)(u)
            return ta_force_from_grad(u, g)
        psi = jax.lax.stop_gradient(self._poly(u, phi))
        phi_s = jax.lax.stop_gradient(phi)

        def surrogate(uu):
            # d|P phi|^2 = 2 Re<psi, dP phi> at stopped psi, phi
            return 2.0 * dot_re_f64(psi, self._poly(uu, phi_s))

        g = jax.grad(surrogate)(u)
        return ta_force_from_grad(u, g)
