"""Monomials: the HMC action is a sum of these (reference: monomial/monomial.c
`monomial_list` with hbfunction/accfunction/derivativefunction pointers).

Each monomial is a frozen dataclass (static under jit) exposing

    heatbath(u, key)  -> (aux, S_initial)   (reference: hbfunction)
    action(u, aux)    -> S_final            (reference: accfunction)
    force(u, aux)     -> F  (ta field [3,3,4,T,X,Mf]; reference:
                             derivativefunction filling `df`)

TPU-native force design: every force is `jax.grad` of a (surrogate) action.
For pseudofermion monomials S = phi^+ A(U)^{-1} phi the implicit-function
identity dS = -X^+ dA X with X = A^{-1} phi (one solve per kick at
ForcePrecision) turns the force into the gradient of the *linear* surrogate
-2 Re<Y, Qhat_+(U) X> at stopped X, Y = Qhat_+ X — replacing the reference's
hand-derived deriv_Sb.c outer-product kernels with AD through the dslash.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tmlqcd_tpu import rng
from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.ops.gauge_action import gauge_action, ta_force_from_grad
from tmlqcd_tpu.solvers.cg import cg
from tmlqcd_tpu.solvers.chrono import ChronoHistory, chrono_guess, chrono_init, chrono_push

__all__ = ["GaugeMonomial", "DetMonomial", "DetRatioMonomial", "norm_sq_f64", "dot_re_f64"]


def norm_sq_f64(v: jax.Array) -> jax.Array:
    return jnp.sum(v.real.astype(jnp.float64) ** 2 + v.imag.astype(jnp.float64) ** 2)


def dot_re_f64(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(
        a.real.astype(jnp.float64) * b.real.astype(jnp.float64)
        + a.imag.astype(jnp.float64) * b.imag.astype(jnp.float64)
    )


def eo_spinor_shape(lat: Lattice) -> tuple:
    """[4 spin, 3 color, T, X, M] — packed pseudofermion field shape."""
    return (4, 3) + lat.eo_site_shape


@dataclasses.dataclass(frozen=True)
class GaugeMonomial:
    """S_g = beta * sum [c0 (1 - ReTr P/3) + c1 (1 - ReTr R/3)]
    (reference: monomial/gauge_monomial.c; c1 selects Wilson/tlSym/Iwasaki)."""

    lat: Lattice
    beta: float
    c1: float = 0.0
    timescale: int = 0
    name: str = "gauge"

    def heatbath(self, u, key):
        return None, gauge_action(u, self.beta, self.lat, self.c1)

    def action(self, u, aux):
        return gauge_action(u, self.beta, self.lat, self.c1)

    def force(self, u, aux):
        # hand-summed staple force (get_staples.c analog; AD oracle-tested)
        from tmlqcd_tpu.ops.gauge_action import gauge_force

        return gauge_force(u, self.beta, self.lat, self.c1)


@dataclasses.dataclass(frozen=True)
class SFGaugeMonomial:
    """Schrödinger-functional Wilson gauge action: Dirichlet-in-time
    boundaries with the abelian background field W(η, ν) frozen at x0=0/T
    (reference: sf_gauge_monomial.c).  The force is `jax.grad` of the SF
    action — exactly zero on frozen dofs because they never enter it; pair
    with HMCConfig.momenta_mask = ops.sf.sf_momenta_mask(lat) so the kinetic
    drift keeps the frozen slots fixed too."""

    lat: Lattice
    beta: float
    eta: float = 0.0
    nu: float = 0.0
    ct: float = 1.0
    timescale: int = 0
    name: str = "sfgauge"

    def _s(self, u):
        from tmlqcd_tpu.ops.sf import sf_gauge_action

        return sf_gauge_action(u, self.beta, self.lat, self.eta, self.nu, self.ct)

    def heatbath(self, u, key):
        return None, self._s(u)

    def action(self, u, aux):
        return self._s(u)

    def force(self, u, aux):
        g = jax.grad(self._s)(u)
        return ta_force_from_grad(u, g)


def _qhat_plus_full(u, psi_o, params, lat, sign=+1.0):
    """Qhat(+-) as a function of the FULL gauge field (packs internally so
    jax.grad w.r.t. u flows through the e/o view)."""
    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params, lat)
    return w.q_hat(ueo, psi_o, params, lat, ph, sign)


def _qhat_pm_full(u, psi_o, params, lat):
    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params, lat)
    return w.q_hat_pm(ueo, psi_o, params, lat, ph)


def _use_fast_solves() -> bool:
    """Route monomial CG solves through the Pallas split-f32 path on TPU.

    The solves (heatbath/acceptance/force) all happen at STOPPED gradients —
    only the force surrogate differentiates the operator, and it stays on
    the jnp path — so no kernel VJP is needed.  On CPU the kernel would run
    in interpret mode (slow), so the jnp path is kept there.  Override with
    TMLQCD_TPU_FAST_SOLVES=0/1.
    """
    import os

    env = os.environ.get("TMLQCD_TPU_FAST_SOLVES")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu"


def _mesh_ctx():
    """(mesh, t_axis, m_axis) of the active domain decomposition, or None.

    When set (parallel.set_active_mesh / use_mesh — the driver installs it
    from NrTProcs/NrYProcs), every fast solve routes through the SHARDED
    Pallas kernel (hopping_pallas_shard: ppermute halfspinor halos +
    interior/surface overlap) — the reference's TM_USE_MPI build where every
    Hopping_Matrix crosses the process boundary (survey §2.3/§3.3).  Force
    SURROGATES fall back to the jnp differentiable path under a mesh: the
    unsharded kernel VJP would be GSPMD-replicated, while the jnp rolls
    partition cleanly — and the surrogate is 1 operator application + VJP
    per kick vs O(10-100) inside the solve, so the sharded-kernel win stays
    where the time is."""
    from tmlqcd_tpu import parallel

    return parallel.active_mesh()


def _fast_unsharded() -> bool:
    """Kernel fast path with NO active mesh (the single-chip fused/VJP
    specializations)."""
    return _use_fast_solves() and _mesh_ctx() is None


class SolveOut(NamedTuple):
    """One solve through the dispatch seam: solution (complex), iteration
    count, and the updated chrono history (None when chrono is off)."""

    x: jax.Array
    iterations: jax.Array
    hist: object


def _resolve_solver(solver: str) -> str:
    """'auto' -> plain CG on every path (reference: the CG default of
    monomial_solve.c; Solver = mixedcg/rgmixedcg stays selectable per
    monomial).

    Measured (round 4, TPU v5e, 16^3x32 Hasenbusch bench point kappa=0.13
    mu=0.01 tol 1e-8): f32 CG converges in ~21 iterations where the
    bf16-sloppy-gauge inner solvers pay a large iteration inflation at the
    bf16 noise floor (mixed 253 inner, rgmixed >1000) — end-to-end
    trajectories run 2.89 s with CG vs 4.26 s with rgmixedcg.  The 1.2x
    per-iteration bandwidth win of the bf16 gauge stream cannot buy back a
    >10x iteration inflation.  Round-5 regime probe (bench/bench_mixed.py,
    8^3x16 thermalized background, tol 1e-8): the inflation GROWS with
    conditioning — kappa=0.15: mixed 0.39x of CG; kappa=0.16 near kappa_c:
    0.27x — so there is NO regime on this hardware where the bf16 sloppy
    tier pays at production tolerances.  Mixed solvers stay selectable for
    parity; the light-mass accelerator is the 2-level MG
    (Solver=dflfgmres, 3.44x/solve measured at kappa_c)."""
    if solver != "auto":
        return solver.lower()
    return "cg"


def _seam_solve(mv, b, name, tol, maxiter, mv_lo=None, lo_dtype=None, x0=None):
    """Route one hermitian solve through solvers.dispatch (reference:
    monomial_solve.c solve_degenerate — the single seam where Solver= keys
    and external backends resolve)."""
    from tmlqcd_tpu.solvers import dispatch

    kw = {}
    if x0 is not None:
        kw["x0"] = x0
    if name in ("mixedcg", "rgmixedcg"):
        if mv_lo is not None:
            kw["matvec_lo"] = mv_lo
        if lo_dtype is not None:
            kw["lo_dtype"] = lo_dtype
    x, iters, _ = dispatch.solve_degenerate(mv, b, solver=name, tol=tol, maxiter=maxiter, **kw)
    return x, iters


def _solve_qpm(u, b, params, lat, tol, maxiter, solver="auto", hist=None):
    """Solve Qhat_pm x = b through the dispatch seam: Pallas fast path on
    TPU (bf16 sloppy-gauge low operator for the mixed solvers), jnp path
    elsewhere (reference: solve_degenerate routing to the accelerated
    backend).  `hist` (ChronoHistory) supplies the chronological initial
    guess and receives the solution (reference: chrono_guess.c called
    around every monomial derivative solve)."""
    name = _resolve_solver(solver)
    if _use_fast_solves():
        from tmlqcd_tpu.ops import wilson_fast as wf

        am = _mesh_ctx()
        fg = wf.make_fast_gauge(u, params, lat)
        if am is not None:
            mesh, t_ax, m_ax = am
            mv = lambda x2: wf.q_hat_pm_fast_shard(fg, x2, params, lat, mesh, t_ax, m_ax)
        else:
            mv = lambda x2: wf.q_hat_pm_fast(fg, x2, params, lat)
        mv_lo = None
        if name in ("mixedcg", "rgmixedcg"):
            fg16 = wf.make_fast_gauge(u, params, lat, sloppy=True)
            if am is not None:
                mesh, t_ax, m_ax = am
                mv_lo = lambda x2: wf.q_hat_pm_fast_shard(fg16, x2, params, lat, mesh, t_ax, m_ax)
            else:
                mv_lo = lambda x2: wf.q_hat_pm_fast(fg16, x2, params, lat)
        b2 = wf.to_split(b)
        x0 = chrono_guess(hist, mv, b2) if hist is not None else None
        x2, iters = _seam_solve(mv, b2, name, tol, maxiter, mv_lo, jnp.float32, x0)
        hist2 = chrono_push(hist, x2) if hist is not None else None
        return SolveOut(wf.from_split(x2, b.dtype), iters, hist2)
    mv = lambda x: _qhat_pm_full(u, x, params, lat)
    x0 = chrono_guess(hist, mv, b) if hist is not None else None
    x, iters = _seam_solve(mv, b, name, tol, maxiter, x0=x0)
    hist2 = chrono_push(hist, x) if hist is not None else None
    return SolveOut(x, iters, hist2)


def _chrono_state(lat: Lattice, n: int, nd: bool = False):
    """Empty per-monomial chrono history in the representation the solves
    use (split f32 on the fast path, complex64 on the jnp path)."""
    if n <= 0:
        return None
    shape = ((2,) if nd else ()) + (4, 3) + lat.eo_site_shape
    if _use_fast_solves():
        return chrono_init(n, (2,) + shape, jnp.float32)
    return chrono_init(n, shape, jnp.complex64)



@dataclasses.dataclass(frozen=True)
class DetMonomial:
    """Two-flavor degenerate pseudofermion: S = phi^+ (Qhat_pm)^{-1} phi,
    representing det(Qhat_pm) = |det Mhat|^2 (reference: monomial/det_monomial.c).

    heatbath: eta ~ N(0,1) complex, phi = Qhat_- eta (= Qhat_+^dag eta), so
    that with Qhat_pm = Qhat_- Qhat_+ the initial action is exactly
    S_0 = phi^+ Qhat_pm^{-1} phi = |eta|^2.
    """

    lat: Lattice
    params: w.DiracParams
    timescale: int = 1
    acc_tol: float = 1e-8
    force_tol: float = 1e-7
    maxiter: int = 1000
    solver: str = "auto"  # reference: the per-monomial Solver = key
    chrono_n: int = 3  # chrono-guess history depth (0 disables; CSGHistory)
    name: str = "det"

    def heatbath(self, u, key):
        eta = rng.normal_spinor(key, eo_spinor_shape(self.lat), u.dtype)
        phi = _qhat_plus_full(u, eta, self.params, self.lat, -1.0)
        return phi, norm_sq_f64(eta)

    def chrono_init_state(self):
        return _chrono_state(self.lat, self.chrono_n)

    def _solve(self, u, b, tol, hist=None):
        return _solve_qpm(
            u, b, self.params, self.lat, tol, self.maxiter, self.solver, hist
        )

    def action(self, u, phi):
        return self.action_info(u, phi)[0]

    def action_info(self, u, phi, hist=None):
        """(S, acceptance-solve iterations) — the per-monomial iteration
        count of the reference's output.data / verbose solver logs.  `hist`
        seeds the solve with the chrono guess from the MD force history."""
        res = self._solve(u, phi, self.acc_tol, hist)
        return dot_re_f64(phi, res.x), res.iterations

    def force(self, u, phi):
        return self.force_chrono(u, phi, None)[0]

    def force_chrono(self, u, phi, hist):
        """(F, hist', iterations) — the derivative solve with chronological
        guessing threaded through the MD (reference: det_monomial.c
        derivativefunction calling chrono_guess + solve + deriv_Sb)."""
        res = self._solve(u, phi, self.force_tol, hist)
        if _fast_unsharded():
            # surrogate gradient on the Pallas kernels: the hopping's
            # custom VJP (deriv_Sb analog) carries the backward pass; only
            # gauge_copy's chain rule stays on jnp
            from tmlqcd_tpu.ops import wilson_fast as wf

            fg = wf.make_fast_gauge(u, self.params, self.lat)
            x2 = jax.lax.stop_gradient(wf.to_split(res.x))
            y2 = jax.lax.stop_gradient(
                wf.q_hat_fast(fg, x2, self.params, self.lat, +1.0)
            )

            def surrogate(uu):
                ug_e, ug_o = wf.split_gauge_pair(uu, self.params, self.lat)
                qx = wf.q_hat_diff(ug_e, ug_o, x2, self.params, self.lat, +1.0)
                return -2.0 * wf.dot_re_f64_split(y2, qx)

            g = jax.grad(surrogate)(u)
            return ta_force_from_grad(u, g), res.hist, res.iterations
        x = res.x
        y = _qhat_plus_full(u, x, self.params, self.lat, +1.0)
        x = jax.lax.stop_gradient(x)
        y = jax.lax.stop_gradient(y)

        def surrogate(uu):
            qx = _qhat_plus_full(uu, x, self.params, self.lat, +1.0)
            return -2.0 * dot_re_f64(y, qx)

        g = jax.grad(surrogate)(u)
        return ta_force_from_grad(u, g), res.hist, res.iterations


@dataclasses.dataclass(frozen=True)
class DetRatioMonomial:
    """Hasenbusch mass-preconditioning ratio
    S = phi^+ Qhat_-(mu2) Qhat_pm(mu1)^{-1} Qhat_+(mu2) phi, representing
    det Qhat_pm(mu1) / det Qhat_pm(mu2), mu2 > mu1
    (reference: monomial/detratio_monomial.c; survey Appendix A Hasenbusch).

    params1: the light (target) operator; params2: the heavy preconditioner.

    heatbath: phi = Qhat_+(2)^{-1} Qhat_-(1) eta gives S_0 = |eta|^2 exactly
    (reference: detratio's heatbath also solves against the preconditioner).
    """

    lat: Lattice
    params1: w.DiracParams
    params2: w.DiracParams
    timescale: int = 1
    acc_tol: float = 1e-8
    force_tol: float = 1e-7
    maxiter: int = 1000
    solver: str = "auto"
    chrono_n: int = 3
    name: str = "detratio"

    def heatbath(self, u, key):
        # phi = Qhat_+(2)^{-1} Qhat_-(1) eta, via the normal equations:
        # phi = Qhat_pm(2)^{-1} Qhat_-(2) b with b = Qhat_-(1) eta.
        eta = rng.normal_spinor(key, eo_spinor_shape(self.lat), u.dtype)
        b = _qhat_plus_full(u, eta, self.params1, self.lat, -1.0)
        b2 = _qhat_plus_full(u, b, self.params2, self.lat, -1.0)
        phi = _solve_qpm(
            u, b2, self.params2, self.lat, self.acc_tol, self.maxiter, self.solver
        ).x
        return phi, norm_sq_f64(eta)

    def chrono_init_state(self):
        # history for the params1 (light-operator) force/acceptance solves
        return _chrono_state(self.lat, self.chrono_n)

    def _psi(self, u, phi):
        """psi = Qhat_+(mu2) phi."""
        return _qhat_plus_full(u, phi, self.params2, self.lat, +1.0)

    def action(self, u, phi):
        return self.action_info(u, phi)[0]

    def action_info(self, u, phi, hist=None):
        psi = self._psi(u, phi)
        res = _solve_qpm(
            u, psi, self.params1, self.lat, self.acc_tol, self.maxiter, self.solver, hist
        )
        return dot_re_f64(psi, res.x), res.iterations

    def force(self, u, phi):
        return self.force_chrono(u, phi, None)[0]

    def force_chrono(self, u, phi, hist):
        if _fast_unsharded():
            from tmlqcd_tpu.ops import wilson_fast as wf

            fg = wf.make_fast_gauge(u, self.params1, self.lat)
            psi2 = wf.q_hat_fast(fg, wf.to_split(phi), self.params2, self.lat, +1.0)
            res = _solve_qpm(
                u, wf.from_split(psi2, phi.dtype), self.params1, self.lat,
                self.force_tol, self.maxiter, self.solver, hist,
            )
            x2 = jax.lax.stop_gradient(wf.to_split(res.x))
            y2 = jax.lax.stop_gradient(
                wf.q_hat_fast(fg, x2, self.params1, self.lat, +1.0)
            )
            phi2 = jax.lax.stop_gradient(wf.to_split(phi))

            def surrogate(uu):
                ug_e, ug_o = wf.split_gauge_pair(uu, self.params1, self.lat)
                t2 = wf.q_hat_diff(ug_e, ug_o, phi2, self.params2, self.lat, +1.0)
                t1 = wf.q_hat_diff(ug_e, ug_o, x2, self.params1, self.lat, +1.0)
                return 2.0 * wf.dot_re_f64_split(x2, t2) - 2.0 * wf.dot_re_f64_split(y2, t1)

            g = jax.grad(surrogate)(u)
            return ta_force_from_grad(u, g), res.hist, res.iterations
        psi = self._psi(u, phi)
        res = _solve_qpm(
            u, psi, self.params1, self.lat, self.force_tol, self.maxiter, self.solver, hist
        )
        x = res.x
        y = _qhat_plus_full(u, x, self.params1, self.lat, +1.0)
        phi_s = jax.lax.stop_gradient(phi)
        x = jax.lax.stop_gradient(x)
        y = jax.lax.stop_gradient(y)

        def surrogate(uu):
            # dS = 2Re<x, dQhat_+(2) phi> - 2Re<y, dQhat_+(1) x>
            # (S = phi^+ Q_-(2) A^{-1} Q_+(2) phi, X = A^{-1} Q_+(2) phi,
            #  Y = Qhat_+(1) X; the dA term is the implicit-solve identity.)
            t2 = _qhat_plus_full(uu, phi_s, self.params2, self.lat, +1.0)
            t1 = _qhat_plus_full(uu, x, self.params1, self.lat, +1.0)
            return 2.0 * dot_re_f64(x, t2) - 2.0 * dot_re_f64(y, t1)

        g = jax.grad(surrogate)(u)
        return ta_force_from_grad(u, g), res.hist, res.iterations


# ---------------------------------------------------------------------------
# Clover monomials (reference: monomial/cloverdet_monomial.c,
# clovertrlog_monomial.c; survey §2.7)
# ---------------------------------------------------------------------------


def _clover_ops(u, params, lat):
    """Hoisted per-U operator state: packed links + clover blocks (computed
    ONCE per U, closed over by the CG matvec so the while_loop body does not
    recompute them every iteration — the analog of the reference refreshing
    sw_term/sw_invert once per gauge update)."""
    from tmlqcd_tpu.ops import clover as cl

    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params, lat)
    sw_e, sw_o = cl.sw_blocks_eo(u, params.kappa, params.c_sw, lat)

    def qpm(x):
        return cl.q_hat_pm_clover(ueo, sw_e, sw_o, x, params, lat, ph)

    def qplus(x, sign=+1.0):
        return cl.q_hat_clover(ueo, sw_e, sw_o, x, params, lat, ph, sign)

    return qpm, qplus


def _solve_qsw(u, b, params, lat, tol, maxiter, solver="auto", hist=None):
    """Solve Qsw_pm x = b through the dispatch seam: Pallas fast path on TPU
    (materialized M_oo / M_ee^{-1} blocks + kernel hopping; bf16 sloppy
    gauge for the mixed solvers' low operator), jnp path elsewhere.  `hist`
    supplies/receives the chronological guess."""
    name = _resolve_solver(solver)
    if _use_fast_solves():
        from tmlqcd_tpu.ops import wilson_fast as wf

        am = _mesh_ctx()
        fc = wf.make_fast_clover(u, params, lat)
        if am is not None:
            mesh, t_ax, m_ax = am
            mv = lambda x2: wf.q_hat_pm_clover_fast_shard(fc, x2, params, lat, mesh, t_ax, m_ax)
        else:
            mv = lambda x2: wf.q_hat_pm_clover_fast(fc, x2, params, lat)
        mv_lo = None
        if name in ("mixedcg", "rgmixedcg"):
            fc16 = wf.make_fast_clover(u, params, lat, sloppy=True)
            if am is not None:
                mesh, t_ax, m_ax = am
                mv_lo = lambda x2: wf.q_hat_pm_clover_fast_shard(fc16, x2, params, lat, mesh, t_ax, m_ax)
            else:
                mv_lo = lambda x2: wf.q_hat_pm_clover_fast(fc16, x2, params, lat)
        b2 = wf.to_split(b)
        x0 = chrono_guess(hist, mv, b2) if hist is not None else None
        x2, iters = _seam_solve(mv, b2, name, tol, maxiter, mv_lo, jnp.float32, x0)
        hist2 = chrono_push(hist, x2) if hist is not None else None
        return SolveOut(wf.from_split(x2, b.dtype), iters, hist2)
    qpm, _ = _clover_ops(u, params, lat)
    x0 = chrono_guess(hist, qpm, b) if hist is not None else None
    x, iters = _seam_solve(qpm, b, name, tol, maxiter, x0=x0)
    hist2 = chrono_push(hist, x) if hist is not None else None
    return SolveOut(x, iters, hist2)


@dataclasses.dataclass(frozen=True)
class CloverDetMonomial:
    """Two-flavor twisted-clover pseudofermion: S = phi^+ (Qsw_pm)^{-1} phi
    (reference: monomial/cloverdet_monomial.c).  The clover force — the
    reference's sw_deriv/sw_spinor/sw_all machinery — is jax.grad through
    sw_blocks inside the surrogate.  Pair with CloverTrlogMonomial for the
    det(M_ee) factor."""

    lat: Lattice
    params: w.DiracParams
    timescale: int = 1
    acc_tol: float = 1e-8
    force_tol: float = 1e-7
    maxiter: int = 1000
    solver: str = "auto"
    chrono_n: int = 3
    name: str = "cloverdet"

    def heatbath(self, u, key):
        qpm, qplus = _clover_ops(u, self.params, self.lat)
        eta = rng.normal_spinor(key, eo_spinor_shape(self.lat), u.dtype)
        phi = qplus(eta, -1.0)
        return phi, norm_sq_f64(eta)

    def chrono_init_state(self):
        return _chrono_state(self.lat, self.chrono_n)

    def action(self, u, phi):
        return self.action_info(u, phi)[0]

    def action_info(self, u, phi, hist=None):
        res = _solve_qsw(
            u, phi, self.params, self.lat, self.acc_tol, self.maxiter, self.solver, hist
        )
        return dot_re_f64(phi, res.x), res.iterations

    def force(self, u, phi):
        return self.force_chrono(u, phi, None)[0]

    def force_chrono(self, u, phi, hist):
        res = _solve_qsw(
            u, phi, self.params, self.lat, self.force_tol, self.maxiter, self.solver, hist
        )
        if _fast_unsharded():
            # the hopping part of the surrogate gradient on the Pallas
            # kernels; the clover-term force (sw_deriv analog) flows
            # through jnp AD of the block construction
            from tmlqcd_tpu.ops import wilson_fast as wf

            fc = wf.make_fast_clover(u, self.params, self.lat)
            x2 = jax.lax.stop_gradient(wf.to_split(res.x))
            y2 = jax.lax.stop_gradient(
                wf.q_hat_clover_fast(fc, x2, self.params, self.lat, +1.0)
            )

            def surrogate(uu):
                ug_e, ug_o, moo, mee_inv = wf.split_clover_pair(
                    uu, self.params, self.lat, +1.0
                )
                qx = wf.q_hat_clover_diff(
                    ug_e, ug_o, moo, mee_inv, x2, self.params, self.lat
                )
                return -2.0 * wf.dot_re_f64_split(y2, qx)

            g = jax.grad(surrogate)(u)
            return ta_force_from_grad(u, g), res.hist, res.iterations
        _, qplus = _clover_ops(u, self.params, self.lat)
        x = res.x
        y = qplus(x, +1.0)
        x = jax.lax.stop_gradient(x)
        y = jax.lax.stop_gradient(y)

        def surrogate(uu):
            _, qplus_u = _clover_ops(uu, self.params, self.lat)
            return -2.0 * dot_re_f64(y, qplus_u(x, +1.0))

        g = jax.grad(surrogate)(u)
        return ta_force_from_grad(u, g), res.hist, res.iterations


@dataclasses.dataclass(frozen=True)
class CloverTrlogMonomial:
    """S = -log |det M_ee(+mu)|^2 summed over even sites — the even/even
    factor of the e/o-preconditioned two-flavor clover determinant
    (reference: monomial/clovertrlog_monomial.c).  Exact action (no solve);
    force by autodiff through the closed-form block determinants."""

    lat: Lattice
    params: w.DiracParams
    timescale: int = 0
    name: str = "clovertrlog"

    def _action(self, u):
        from tmlqcd_tpu.ops import clover as cl

        sw_e, _ = cl.sw_blocks_eo(u, self.params.kappa, self.params.c_sw, self.lat)
        return -cl.sw_logdet(sw_e, self.params.mutld, +1.0)

    def heatbath(self, u, key):
        return None, self._action(u)

    def action(self, u, aux):
        return self._action(u)

    def force(self, u, aux):
        g = jax.grad(self._action)(u)
        return ta_force_from_grad(u, g)


@dataclasses.dataclass(frozen=True)
class CloverDetRatioMonomial:
    """Hasenbusch ratio for the twisted-CLOVER operator:
    S = phi^+ Qsw_-(mu2) Qsw_pm(mu1)^{-1} Qsw_+(mu2) phi
    (reference: monomial/cloverdetratio_monomial.c).

    mu1 = target (light) twisted mass, mu2 = heavy preconditioner; kappa and
    c_sw are shared, so the clover field/inverse blocks are built ONCE per
    gauge and reused by both operators (exactly the reference's sw_term
    refresh discipline)."""

    lat: Lattice
    params1: w.DiracParams  # light (target)
    params2: w.DiracParams  # heavy preconditioner
    timescale: int = 1
    acc_tol: float = 1e-8
    force_tol: float = 1e-7
    maxiter: int = 1000
    solver: str = "auto"
    chrono_n: int = 3
    name: str = "cloverdetratio"

    def __post_init__(self):
        if (self.params1.kappa, self.params1.c_sw) != (self.params2.kappa, self.params2.c_sw):
            raise ValueError("cloverdetratio: kappa/c_sw must match between operators")

    def _ops(self, u):
        from tmlqcd_tpu.ops import clover as cl

        ueo = pack_gauge_eo(u, self.lat)
        ph = w.boundary_phases(self.params1, self.lat)
        sw_e, sw_o = cl.sw_blocks_eo(u, self.params1.kappa, self.params1.c_sw, self.lat)

        def qpm1(x):
            return cl.q_hat_pm_clover(ueo, sw_e, sw_o, x, self.params1, self.lat, ph)

        def qplus(x, params, sign=+1.0):
            return cl.q_hat_clover(ueo, sw_e, sw_o, x, params, self.lat, ph, sign)

        return qpm1, qplus

    def heatbath(self, u, key):
        # phi = Qsw_+(2)^{-1} Qsw_-(1) eta via the (2)-normal equations
        from tmlqcd_tpu.ops import clover as cl

        ueo = pack_gauge_eo(u, self.lat)
        ph = w.boundary_phases(self.params1, self.lat)
        sw_e, sw_o = cl.sw_blocks_eo(u, self.params1.kappa, self.params1.c_sw, self.lat)
        eta = rng.normal_spinor(key, eo_spinor_shape(self.lat), u.dtype)
        b = cl.q_hat_clover(ueo, sw_e, sw_o, eta, self.params1, self.lat, ph, -1.0)
        b2 = cl.q_hat_clover(ueo, sw_e, sw_o, b, self.params2, self.lat, ph, -1.0)
        mv2 = lambda x: cl.q_hat_pm_clover(ueo, sw_e, sw_o, x, self.params2, self.lat, ph)
        phi = cg(mv2, b2, tol=self.acc_tol, maxiter=self.maxiter).x
        return phi, norm_sq_f64(eta)

    def chrono_init_state(self):
        return _chrono_state(self.lat, self.chrono_n)

    def action(self, u, phi):
        return self.action_info(u, phi)[0]

    def action_info(self, u, phi, hist=None):
        _, qplus = self._ops(u)
        psi = qplus(phi, self.params2, +1.0)
        res = _solve_qsw(
            u, psi, self.params1, self.lat, self.acc_tol, self.maxiter, self.solver, hist
        )
        return dot_re_f64(psi, res.x), res.iterations

    def force(self, u, phi):
        return self.force_chrono(u, phi, None)[0]

    def force_chrono(self, u, phi, hist):
        _, qplus = self._ops(u)
        psi = qplus(phi, self.params2, +1.0)
        res = _solve_qsw(
            u, psi, self.params1, self.lat, self.force_tol, self.maxiter, self.solver, hist
        )
        x = res.x
        y = qplus(x, self.params1, +1.0)
        phi_s = jax.lax.stop_gradient(phi)
        x = jax.lax.stop_gradient(x)
        y = jax.lax.stop_gradient(y)

        def surrogate(uu):
            _, qplus_u = self._ops(uu)
            t2 = qplus_u(phi_s, self.params2, +1.0)
            t1 = qplus_u(x, self.params1, +1.0)
            return 2.0 * dot_re_f64(x, t2) - 2.0 * dot_re_f64(y, t1)

        g = jax.grad(surrogate)(u)
        return ta_force_from_grad(u, g), res.hist, res.iterations
