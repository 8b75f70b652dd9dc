"""Rational (RHMC) monomials for the non-degenerate doublet — det weight
det(Q_nd^2)^{1/2} = |det Q_nd| of the strange/charm sector.

Reference: monomial/ndrat_monomial.c (+ ndratcor), rational/rational.c,
solver/cg_mms_tm_nd.c; survey §2.7 "Rational (RHMC) monomials".

Scheme (see tmlqcd_tpu.solvers.rational for the construction):

    S = phi^+ R(Q^2) phi,   R(x) = sum_j rho_j/(x + sigma_j) ~ x^{-1/2},

so the sampled weight is det R(Q^2)^{-1} ~ det(Q^2)^{1/2}.  One multishift
CG per heatbath / acceptance / force:

  * heatbath: phi = B(Q) eta with B^+B = R^{-1} exactly (first-order
    factorization, reference: rat.nu shifts) — S_0 = |eta|^2 exactly.
  * acceptance: S = sum_j rho_j <phi, (Q^2+sigma_j)^{-1} phi>.
  * force: dS = -sum_j rho_j * 2 Re<y_j, dQ x_j>, x_j = (Q^2+sigma_j)^{-1}phi,
    y_j = Q x_j — an AD surrogate linear in Q(U) at stopped x_j, y_j
    (replacing the reference's per-shift deriv_Sb/sw_deriv accumulations).

The approximation interval [s_min, s_max] must bracket spec(Q_nd^2);
`tmlqcd_tpu.solvers.eigen` estimates the bounds (reference: input
StildeMin/StildeMax + the Jacobi-Davidson check in phmc/ndrat init).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu import rng
from tmlqcd_tpu.hmc.monomials import dot_re_f64, norm_sq_f64
from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import ndoublet as nd
from tmlqcd_tpu.ops.gauge_action import ta_force_from_grad
from tmlqcd_tpu.ops.wilson import boundary_phases
from tmlqcd_tpu.solvers.multishift import cg_multishift
from tmlqcd_tpu.solvers.rational import RationalApprox, rational_invsqrt

__all__ = [
    "NDRatMonomial",
    "RatMonomial",
    "RatCorMonomial",
    "NDRatCorMonomial",
]


def _nd_spinor_shape(lat: Lattice) -> tuple:
    return (2, 4, 3) + lat.eo_site_shape


@dataclasses.dataclass(frozen=True)
class NDRatMonomial:
    """Nf=1+1 rational monomial (reference: BeginMonomial NDRAT with
    2Kappamubar/2Kappaepsbar, RationalOrder, StildeMin/StildeMax,
    Timescale...)."""

    lat: Lattice
    params: nd.NDParams
    order: int = 12
    s_min: float = 1e-4  # lower spectral bound of Q_nd^2 (2k-normalized)
    s_max: float = 4.0  # upper spectral bound
    timescale: int = 1
    acc_tol: float = 1e-9
    force_tol: float = 1e-8
    maxiter: int = 2000
    name: str = "ndrat"

    @property
    def rat(self) -> RationalApprox:
        return rational_invsqrt(self.order, self.s_min, self.s_max)

    def _q(self, u, chi):
        """Q_nd chi as a function of the FULL gauge field (differentiable:
        jax.grad w.r.t. u flows through the e/o packing and, for c_sw != 0,
        through the clover blocks — the clover-ND force for free)."""
        ph = boundary_phases(self.params.wilson, self.lat)
        ueo = pack_gauge_eo(u, self.lat)
        if self.params.c_sw != 0.0:
            from tmlqcd_tpu.ops import clover as cl

            sw_e, sw_o = cl.sw_blocks_eo(u, self.params.kappa, self.params.c_sw, self.lat)
            return cl.q_nd_clover(ueo, sw_e, sw_o, chi, self.params, self.lat, ph)
        return nd.q_nd(ueo, chi, self.params, self.lat, ph)

    def _mms_info(self, u, b, shifts: np.ndarray, tol: float):
        from tmlqcd_tpu.hmc.monomials import _mesh_ctx, _use_fast_solves

        if _use_fast_solves():
            # the multishift CG (the dominant cost of every heatbath/
            # acceptance/force) on the Pallas split path; solutions are
            # stopped gradients, so no kernel VJP is needed.  Clover-ND
            # runs on materialized flavor-2x2 block inverses (sw_invert_nd
            # analog, built once per gauge).  With an active mesh the
            # operator is the domain-decomposed sharded kernel (reference:
            # cg_mms_tm_nd under MPI decomposition).
            from tmlqcd_tpu.ops import dslash_pallas as dpl
            from tmlqcd_tpu.ops import wilson_fast as wf

            am = _mesh_ctx()
            if self.params.c_sw != 0.0:
                fc = wf.make_fast_clover_nd(u, self.params, self.lat)
                if am is not None:
                    mesh, t_ax, m_ax = am
                    mv = lambda c2: wf.q_nd_sq_clover_fast_shard(
                        fc, c2, self.params, self.lat, mesh, t_ax, m_ax
                    )
                else:
                    mv = lambda c2: wf.q_nd_sq_clover_fast(fc, c2, self.params, self.lat)
            else:
                fg = wf.make_fast_gauge(u, self.params.wilson, self.lat)
                if am is not None:
                    mesh, t_ax, m_ax = am
                    mv = lambda c2: wf.q_nd_sq_fast_shard(
                        fg, c2, self.params, self.lat, mesh, t_ax, m_ax
                    )
                else:
                    mv = lambda c2: wf.q_nd_sq_fast(fg, c2, self.params, self.lat)
            res = cg_multishift(
                mv, wf.to_split(b), jnp.asarray(shifts), tol=tol, maxiter=self.maxiter
            )
            xs = jax.vmap(lambda x2: dpl.merge_c(x2, b.dtype))(res.x)
            return xs, res.iterations
        mv = lambda x: self._q(u, self._q(u, x))
        res = cg_multishift(mv, b, jnp.asarray(shifts), tol=tol, maxiter=self.maxiter)
        return res.x, res.iterations

    def _mms(self, u, b, shifts: np.ndarray, tol: float):
        """Multishift solve (Q^2 + shift_k) x_k = b for all k."""
        return self._mms_info(u, b, shifts, tol)[0]

    def heatbath(self, u, key):
        rat = self.rat
        alpha, gamma, beta_n, rho_lead = rat.heatbath_parts()
        eta = rng.normal_spinor(key, _nd_spinor_shape(self.lat), u.dtype)
        # x_l = (Q^2 + alpha_l^2)^{-1} eta ; shifts alpha^2 = numerator roots
        xs = self._mms(u, eta, rat.a_roots, self.acc_tol)
        # v = eta + sum_l gamma_l (Q - i alpha_l) x_l
        cdt = eta.dtype
        gsum = jnp.zeros_like(eta)
        gasum = jnp.zeros_like(eta)
        for el in range(rat.order - 1):
            g = jnp.asarray(gamma[el], cdt)
            ga = jnp.asarray(gamma[el] * (-1j) * alpha[el], cdt)
            gsum = gsum + g * xs[el]
            gasum = gasum + ga * xs[el]
        v = eta + self._q(u, gsum) + gasum
        # phi = (Q + i beta_N) v / sqrt(rhoL)
        ibeta = jnp.asarray(1j * beta_n, cdt)
        phi = (self._q(u, v) + ibeta * v) * jnp.asarray(
            1.0 / np.sqrt(rho_lead), v.real.dtype
        )
        return phi, norm_sq_f64(eta)

    def action(self, u, phi):
        return self.action_info(u, phi)[0]

    def action_info(self, u, phi):
        rat = self.rat
        xs, iters = self._mms_info(u, phi, rat.sigma, self.acc_tol)
        s = jnp.asarray(0.0, jnp.float64)
        for j in range(rat.order):
            s = s + jnp.asarray(rat.rho[j], jnp.float64) * dot_re_f64(phi, xs[j])
        return s, iters

    def force(self, u, phi):
        return self.force_info(u, phi)[0]

    def force_info(self, u, phi):
        """(F, multishift iterations) — the per-monomial MD solver-iteration
        count of the reference's output.data contract (survey §5.5: the
        reference prints every monomial's solver iterations per trajectory;
        ndrat_monomial.c's derivative reports its cg_mms_tm_nd count)."""
        from tmlqcd_tpu.hmc.monomials import _fast_unsharded

        rat = self.rat
        if _fast_unsharded():
            # multishift solve AND the per-pole surrogate gradients on the
            # Pallas kernels (hopping custom VJP); xs/ys stay split-f32.
            # With clover the gauge-copy part of the gradient rides the
            # kernel VJP while the clover-block part (sw_deriv_nd analog)
            # flows through jnp AD of the materialized blocks.
            from tmlqcd_tpu.ops import wilson_fast as wf

            clov = self.params.c_sw != 0.0
            if clov:
                fc = wf.make_fast_clover_nd(u, self.params, self.lat)
                mv = lambda c2: wf.q_nd_sq_clover_fast(fc, c2, self.params, self.lat)
                yop = lambda x2: wf.q_nd_clover_fast(fc, x2, self.params, self.lat)
            else:
                fg = wf.make_fast_gauge(u, self.params.wilson, self.lat)
                mv = lambda c2: wf.q_nd_sq_fast(fg, c2, self.params, self.lat)
                yop = lambda x2: wf.q_nd_fast(fg, x2, self.params, self.lat)
            res = cg_multishift(
                mv, wf.to_split(phi), jnp.asarray(rat.sigma),
                tol=self.force_tol, maxiter=self.maxiter,
            )
            xs2 = jax.lax.stop_gradient(res.x)
            ys2 = jax.lax.stop_gradient(
                jnp.stack([yop(xs2[j]) for j in range(rat.order)])
            )

            def surrogate(uu):
                if clov:
                    parts = wf.split_clover_nd_pair(uu, self.params, self.lat)
                    qop = lambda c2: wf.q_nd_clover_diff(
                        *parts, c2, self.params, self.lat
                    )
                else:
                    ug_e, ug_o = wf.split_gauge_pair(
                        uu, self.params.wilson, self.lat
                    )
                    qop = lambda c2: wf.q_nd_diff(
                        ug_e, ug_o, c2, self.params, self.lat
                    )
                s = jnp.asarray(0.0, jnp.float64)
                for j in range(rat.order):
                    s = s - 2.0 * jnp.asarray(rat.rho[j], jnp.float64) * (
                        wf.dot_re_f64_split(ys2[j], qop(xs2[j]))
                    )
                return s

            g = jax.grad(surrogate)(u)
            return ta_force_from_grad(u, g), res.iterations
        xs, iters = self._mms_info(u, phi, rat.sigma, self.force_tol)
        ys = jnp.stack([self._q(u, xs[j]) for j in range(rat.order)])
        xs = jax.lax.stop_gradient(xs)
        ys = jax.lax.stop_gradient(ys)

        def surrogate(uu):
            s = jnp.asarray(0.0, jnp.float64)
            for j in range(rat.order):
                s = s - 2.0 * jnp.asarray(rat.rho[j], jnp.float64) * dot_re_f64(
                    ys[j], self._q(uu, xs[j])
                )
            return s

        g = jax.grad(surrogate)(u)
        return ta_force_from_grad(u, g), iters


@dataclasses.dataclass(frozen=True)
class RatMonomial:
    """One-flavor degenerate rational monomial — det weight
    det(Qhat_pm)^{1/2} = |det Qhat| of a single Wilson(-clover) flavor
    (reference: monomial/rat_monomial.c, types RAT / CLOVERRAT).

    Same rational scheme as NDRatMonomial but on single-flavor odd spinors
    with A = Qhat_pm = Qhat_- Qhat_+.  The exact first-order heatbath
    factorization needs a hermitian Q with Q^2 = A, which holds iff mu == 0
    (Q = gamma5 Mhat); the construction therefore requires params.mu == 0 —
    the production use case (1-flavor strange/charm in clover-improved
    runs).  A twisted one-flavor determinant is covered by NDRatMonomial
    with epsbar = 0 instead.
    """

    lat: Lattice
    params: object  # w.DiracParams (mu must be 0, see class docstring)
    order: int = 12
    s_min: float = 1e-4
    s_max: float = 4.0
    timescale: int = 1
    acc_tol: float = 1e-9
    force_tol: float = 1e-8
    maxiter: int = 2000
    name: str = "rat"

    def __post_init__(self):
        if getattr(self.params, "mu", 0.0) != 0.0:
            raise ValueError(
                "RatMonomial requires mu == 0 (hermitian Q = gamma5 Mhat for "
                "the exact heatbath); use NDRatMonomial with epsbar=0 for a "
                "twisted one-flavor determinant"
            )

    @property
    def rat(self) -> RationalApprox:
        return rational_invsqrt(self.order, self.s_min, self.s_max)

    def _q(self, u, x, sign: float = +1.0):
        """Qhat(+-) x, differentiable in the full gauge field u."""
        from tmlqcd_tpu.hmc.monomials import _qhat_plus_full

        if self.params.c_sw != 0.0:
            from tmlqcd_tpu.hmc.monomials import _clover_ops

            _, qplus = _clover_ops(u, self.params, self.lat)
            return qplus(x, sign)
        return _qhat_plus_full(u, x, self.params, self.lat, sign)

    def _mms_info(self, u, b, shifts: np.ndarray, tol: float):
        from tmlqcd_tpu.hmc.monomials import _clover_ops, _mesh_ctx, _use_fast_solves

        if _use_fast_solves():
            from tmlqcd_tpu.ops import dslash_pallas as dpl
            from tmlqcd_tpu.ops import wilson_fast as wf

            am = _mesh_ctx()
            if self.params.c_sw != 0.0:
                fc = wf.make_fast_clover(u, self.params, self.lat)
                if am is not None:
                    mesh, t_ax, m_ax = am
                    mv = lambda x2: wf.q_hat_pm_clover_fast_shard(
                        fc, x2, self.params, self.lat, mesh, t_ax, m_ax
                    )
                else:
                    mv = lambda x2: wf.q_hat_pm_clover_fast(fc, x2, self.params, self.lat)
            else:
                fg = wf.make_fast_gauge(u, self.params, self.lat)
                if am is not None:
                    mesh, t_ax, m_ax = am
                    mv = lambda x2: wf.q_hat_pm_fast_shard(
                        fg, x2, self.params, self.lat, mesh, t_ax, m_ax
                    )
                else:
                    mv = lambda x2: wf.q_hat_pm_fast(fg, x2, self.params, self.lat)
            res = cg_multishift(
                mv, wf.to_split(b), jnp.asarray(shifts), tol=tol, maxiter=self.maxiter
            )
            xs = jax.vmap(lambda x2: dpl.merge_c(x2, b.dtype))(res.x)
            return xs, res.iterations
        if self.params.c_sw != 0.0:
            mv, _ = _clover_ops(u, self.params, self.lat)
        else:
            from tmlqcd_tpu.hmc.monomials import _qhat_pm_full

            mv = lambda x: _qhat_pm_full(u, x, self.params, self.lat)
        res = cg_multishift(mv, b, jnp.asarray(shifts), tol=tol, maxiter=self.maxiter)
        return res.x, res.iterations

    def _mms(self, u, b, shifts: np.ndarray, tol: float):
        return self._mms_info(u, b, shifts, tol)[0]

    def heatbath(self, u, key):
        """phi = B eta with B^+B = R^{-1}(Q^2) exactly (first-order factors
        in the hermitian Q = gamma5 Mhat; reference: rat_monomial.c
        rat_heatbath with rat.nu shifts)."""
        from tmlqcd_tpu.hmc.monomials import eo_spinor_shape

        rat = self.rat
        alpha, gamma, beta_n, rho_lead = rat.heatbath_parts()
        eta = rng.normal_spinor(key, eo_spinor_shape(self.lat), u.dtype)
        xs = self._mms(u, eta, rat.a_roots, self.acc_tol)
        cdt = eta.dtype
        gsum = jnp.zeros_like(eta)
        gasum = jnp.zeros_like(eta)
        for el in range(rat.order - 1):
            g = jnp.asarray(gamma[el], cdt)
            ga = jnp.asarray(gamma[el] * (-1j) * alpha[el], cdt)
            gsum = gsum + g * xs[el]
            gasum = gasum + ga * xs[el]
        v = eta + self._q(u, gsum) + gasum
        ibeta = jnp.asarray(1j * beta_n, cdt)
        phi = (self._q(u, v) + ibeta * v) * jnp.asarray(
            1.0 / np.sqrt(rho_lead), v.real.dtype
        )
        return phi, norm_sq_f64(eta)

    def action(self, u, phi):
        return self.action_info(u, phi)[0]

    def action_info(self, u, phi):
        rat = self.rat
        xs, iters = self._mms_info(u, phi, rat.sigma, self.acc_tol)
        s = jnp.asarray(0.0, jnp.float64)
        for j in range(rat.order):
            s = s + jnp.asarray(rat.rho[j], jnp.float64) * dot_re_f64(phi, xs[j])
        return s, iters

    def force(self, u, phi):
        return self.force_info(u, phi)[0]

    def force_info(self, u, phi):
        """dS = -sum_j rho_j x_j^+ dA x_j = -sum_j rho_j 2Re<z_j, dQhat_+ x_j>
        with z_j = Qhat_+ x_j (A = Qhat_- Qhat_+, Qhat_-^+ = Qhat_+).
        Returns (F, multishift iterations) for the output.data contract."""
        from tmlqcd_tpu.hmc.monomials import _fast_unsharded

        rat = self.rat
        if _fast_unsharded():
            # Multishift solve and per-pole surrogate gradients on the Pallas
            # kernels; with clover (CLOVERRAT) the gauge-copy gradient rides
            # the kernel VJP and the clover-block part (sw_deriv analog)
            # flows through jnp AD of the materialized blocks — mirroring
            # NDRatMonomial.force.
            from tmlqcd_tpu.ops import wilson_fast as wf

            clov = self.params.c_sw != 0.0
            if clov:
                fc = wf.make_fast_clover(u, self.params, self.lat)
                mv = lambda c2: wf.q_hat_pm_clover_fast(fc, c2, self.params, self.lat)
                zop = lambda x2: wf.q_hat_clover_fast(fc, x2, self.params, self.lat, +1.0)
            else:
                fg = wf.make_fast_gauge(u, self.params, self.lat)
                mv = lambda c2: wf.q_hat_pm_fast(fg, c2, self.params, self.lat)
                zop = lambda x2: wf.q_hat_fast(fg, x2, self.params, self.lat, +1.0)
            res = cg_multishift(
                mv, wf.to_split(phi), jnp.asarray(rat.sigma),
                tol=self.force_tol, maxiter=self.maxiter,
            )
            xs2 = jax.lax.stop_gradient(res.x)
            zs2 = jax.lax.stop_gradient(
                jnp.stack([zop(xs2[j]) for j in range(rat.order)])
            )

            def surrogate(uu):
                if clov:
                    parts = wf.split_clover_pair(uu, self.params, self.lat, +1.0)
                    qop = lambda x2: wf.q_hat_clover_diff(
                        *parts, x2, self.params, self.lat
                    )
                else:
                    ug_e, ug_o = wf.split_gauge_pair(uu, self.params, self.lat)
                    qop = lambda x2: wf.q_hat_diff(
                        ug_e, ug_o, x2, self.params, self.lat, +1.0
                    )
                s = jnp.asarray(0.0, jnp.float64)
                for j in range(rat.order):
                    s = s - 2.0 * jnp.asarray(rat.rho[j], jnp.float64) * (
                        wf.dot_re_f64_split(zs2[j], qop(xs2[j]))
                    )
                return s

            g = jax.grad(surrogate)(u)
            return ta_force_from_grad(u, g), res.iterations
        xs, iters = self._mms_info(u, phi, rat.sigma, self.force_tol)
        zs = jnp.stack([self._q(u, xs[j], +1.0) for j in range(rat.order)])
        xs = jax.lax.stop_gradient(xs)
        zs = jax.lax.stop_gradient(zs)

        def surrogate(uu):
            s = jnp.asarray(0.0, jnp.float64)
            for j in range(rat.order):
                s = s - 2.0 * jnp.asarray(rat.rho[j], jnp.float64) * dot_re_f64(
                    zs[j], self._q(uu, xs[j], +1.0)
                )
            return s

        g = jax.grad(surrogate)(u)
        return ta_force_from_grad(u, g), iters


# ---------------------------------------------------------------------------
# Accept/reject-coupled correction monomials (reference: ratcor_monomial.c /
# ndratcor_monomial.c).  The RAT/NDRAT monomial samples det R^{-1}(Q^2); the
# correction multiplies in the missing factor
#
#     det[(Q^2)^{1/2} R(Q^2)] = det(Z)^{1/2},   Z = Q^2 R(Q^2)^2 ~ 1,
#
# via a pseudofermion S_cor = phi^+ Z^{-1/2} phi (heatbath phi = Z^{1/4} eta,
# so S_0 = |eta|^2 exactly).  Z^{+1/4} and Z^{-1/2} are applied with the
# binomial series (1+u)^p = sum_k C(p,k) u^k in u = Z - 1, ||u|| <= delta
# (the rational's relative error) — a handful of terms reaches machine
# precision, matching the reference's apply-until-precision Taylor loop.
# Each Z application costs two multishift solves + one Q^2.
#
# The correction acts through the Hamiltonian (heatbath + acceptance) only;
# its MD force is zero — exactness is restored by the Metropolis step, and
# the induced dH is O(delta * dS) (reference: *cor monomials register no
# derivative function).  This is the standard way to run a CHEAP low-order
# rational on the MD timescales and stay exact.
# ---------------------------------------------------------------------------


def _binom_coeffs(p: float, n: int) -> np.ndarray:
    """C(p, k), k = 0..n, for the (1+u)^p series (host f64)."""
    c = np.ones(n + 1)
    for k in range(1, n + 1):
        c[k] = c[k - 1] * (p - (k - 1)) / k
    return c


def _apply_z(mono, u, v, tol):
    """(Z v, solver iterations): Z = Q^2 R(Q^2)^2 (two multishifts + one
    Q^2 apply); the iteration count is summed over both solves."""
    rat = mono.rat

    def r_apply(w_):
        xs, its = mono._mms_info(u, w_, rat.sigma, tol)
        out = jnp.zeros_like(w_)
        for j in range(rat.order):
            out = out + jnp.asarray(rat.rho[j], w_.real.dtype) * xs[j]
        return out, its

    r1, it1 = r_apply(v)
    rr, it2 = r_apply(r1)
    return mono._q(u, mono._q(u, rr)), it1 + it2


def _apply_z_pow(mono, u, v, p: float, n_terms: int, tol):
    """((Z)^p v, total solver iterations) by the binomial series in (Z-1)."""
    coeffs = _binom_coeffs(p, n_terms)
    acc = v
    term = v
    its = jnp.asarray(0, jnp.int32)
    for k in range(1, n_terms + 1):
        zv, it_k = _apply_z(mono, u, term, tol)
        term = zv - term
        its = its + it_k
        acc = acc + jnp.asarray(coeffs[k], v.real.dtype) * term
    return acc, its


class _RatCorMixin:
    """heatbath/action/force overrides shared by the degenerate and
    non-degenerate correction monomials (the base class supplies _q, _mms,
    rat and the spinor shape via its own heatbath machinery)."""

    def _eta_shape(self):
        raise NotImplementedError

    def heatbath(self, u, key):
        eta = rng.normal_spinor(key, self._eta_shape(), u.dtype)
        phi, _ = _apply_z_pow(self, u, eta, +0.25, self.n_terms, self.acc_tol)
        return phi, norm_sq_f64(eta)

    def action(self, u, phi):
        return self.action_info(u, phi)[0]

    def action_info(self, u, phi):
        # iterations: total multishift iterations of the series application
        # (no extra solve burned just for the log)
        w_, iters = _apply_z_pow(self, u, phi, -0.5, self.n_terms, self.acc_tol)
        return dot_re_f64(phi, w_), iters

    def force(self, u, phi):
        # accept/reject-only monomial: no MD force (see block comment above)
        return jnp.zeros_like(u)

    def force_info(self, u, phi):
        # overrides the base monomial's solver-backed force_info: the
        # correction acts through the Hamiltonian only, so the integrator
        # must see a zero force AND zero solve iterations
        return jnp.zeros_like(u), jnp.asarray(0, jnp.int32)


@dataclasses.dataclass(frozen=True)
class RatCorMonomial(_RatCorMixin, RatMonomial):
    """Correction to RatMonomial: det[(Q^2)^{1/2} R(Q^2)] by accept/reject
    (reference: monomial/ratcor_monomial.c, types RATCOR / CLOVERRATCOR).
    Pair it with a RatMonomial of the SAME kappa/c_sw/order/interval."""

    n_terms: int = 4
    name: str = "ratcor"

    def _eta_shape(self):
        from tmlqcd_tpu.hmc.monomials import eo_spinor_shape

        return eo_spinor_shape(self.lat)


@dataclasses.dataclass(frozen=True)
class NDRatCorMonomial(_RatCorMixin, NDRatMonomial):
    """Correction to NDRatMonomial: det[(Q_nd^2)^{1/2} R(Q_nd^2)] by
    accept/reject (reference: monomial/ndratcor_monomial.c, types
    NDRATCOR / NDCLOVERRATCOR)."""

    n_terms: int = 4
    name: str = "ndratcor"

    def _eta_shape(self):
        return _nd_spinor_shape(self.lat)


def ndrat_correction_samples(
    mono: NDRatMonomial, u, key, n_samples: int = 6, order_hi: int | None = None
):
    """Stochastic estimate of the rational-approximation correction factor
    (reference: monomial/ndratcor_monomial.c — the *cor monomials correct
    det R^{-1} to det (Q^2)^{1/2} by noisy accept/reject; here the same
    correction as reweighting samples, survey §2.7).

    Exponent samples s_i with det(M)^{-1} = E[exp(s_i)], where
    M = R_lo(Q^2) / R_hi(Q^2) and R_hi (order_hi, default 2x) stands in for
    the exact x^{-1/2} (its own error is quadratically smaller).  One
    multishift CG per rational application.
    """
    from tmlqcd_tpu.hmc.monomials import dot_re_f64, norm_sq_f64

    hi = rational_invsqrt(order_hi or 2 * mono.order, mono.s_min, mono.s_max)
    lo = mono.rat

    def apply_rat(rat, v):
        xs = mono._mms(u, v, rat.sigma, mono.acc_tol)
        out = jnp.zeros_like(v)
        for j in range(rat.order):
            out = out + jnp.asarray(rat.rho[j], v.real.dtype) * xs[j]
        return out

    def apply_rat_inv(rat, v):
        # R^{-1} v via CG on R (hermitian positive, well conditioned)
        from tmlqcd_tpu.solvers.cg import cg

        return cg(lambda x: apply_rat(rat, x), v, tol=mono.acc_tol, maxiter=mono.maxiter).x

    samples = []
    for i in range(n_samples):
        eta = rng.normal_spinor(rng.fold(key, i), _nd_spinor_shape(mono.lat), u.dtype)
        m_eta = apply_rat(lo, apply_rat_inv(hi, eta))
        samples.append(norm_sq_f64(eta) - dot_re_f64(eta, m_eta))
    return jnp.stack(samples)
