"""Overlap (Neuberger) fermions: chirally exact lattice Dirac operator via
the matrix sign function of the hermitian Wilson kernel.

Reference: operator/Dov_psi.c (`Dov_psi` — Chebyshev approximation of
sign(Q_W) with exact treatment of deflated low modes), solver/eigenvalues.c
(the low-mode eigensolver feeding the deflation), operator/P_M_eta.c /
X_psi.c (sign-function helpers).  Survey §2.5 lists the overlap operator as
present-in-reference; this module provides the TPU-native equivalent.

Operator (massive overlap, Ginsparg-Wilson radius rho in (0, 2)):

    D_ov(m) = (rho + m/2) + (rho - m/2) * gamma5 * sign(Q_W)
    Q_W     = gamma5 D_W(-rho)          (hermitian, indefinite Wilson kernel)

At m = 0 the Ginsparg-Wilson relation {gamma5, D} = D gamma5 D / rho holds
exactly when sign(Q)^2 = 1 — the accuracy of the sign approximation IS the
chirality violation, which tests measure directly (`gw_defect`).

sign(Q) psi is computed tmLQCD-style in two parts:
  1. the n_ev lowest-|lambda| eigenmodes of Q (Lanczos,
     solvers/lanczos.lowest_eigenpairs) contribute sign(lambda_i) exactly;
  2. on the orthogonal complement, Q * p(Q^2) with p a Chebyshev
     approximation of 1/sqrt on [lo^2, hi^2] (solvers/chebyshev), where
     [lo, hi] brackets the undeflated |spectrum| — deflation shrinks the
     interval and hence the required degree ~ sqrt(hi/lo) log(1/eps).

The kernel uses ops/wilson.d_full with kappa = 1/(8 - 2 rho) (the 2-kappa
normalization rescales Q_W by a positive constant, which the sign function
ignores).  Setup (`make_overlap`) runs once per gauge configuration — the
analog of the reference's eigensolver init before overlap inversions.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu.gamma import apply_gamma5
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops.wilson import DiracParams, d_full
from tmlqcd_tpu.solvers.chebyshev import chebyshev_apply, chebyshev_coeffs, chebyshev_eval

__all__ = [
    "OverlapParams",
    "OverlapSetup",
    "make_overlap",
    "sign_q",
    "dov_psi",
    "dov_dagger_psi",
    "gw_defect",
    "invert_overlap",
]


@dataclasses.dataclass(frozen=True)
class OverlapParams:
    """Static overlap parameters (reference: Dov_psi.c globals — the
    negative Wilson mass s/rho, the overlap quark mass m_ov, the sign-
    function polynomial degree, and the deflated low-mode count)."""

    rho: float = 1.0  # GW radius = -(negative Wilson kernel mass); 0<rho<2
    m: float = 0.0  # bare overlap quark mass
    degree: int = 64  # Chebyshev degree of the 1/sqrt approximation
    n_ev: int = 0  # exactly-treated low modes of Q_W
    lanczos_steps: Optional[int] = None  # default max(4 n_ev, 40)
    theta: tuple = (1.0, 0.0, 0.0, 0.0)  # boundary phases (antiperiodic t)

    @property
    def kernel(self) -> DiracParams:
        """Negative-mass Wilson kernel D_W(-rho): kappa = 1/(8 - 2 rho)."""
        return DiracParams(kappa=1.0 / (8.0 - 2.0 * self.rho), mu=0.0, theta=self.theta)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OverlapSetup:
    """Per-gauge-configuration overlap state: the gauge field, the deflation
    subspace of Q_W, and the (static) Chebyshev data."""

    u: jax.Array  # full gauge [3,3,4,T,X,Mf]
    evecs: jax.Array  # [n_ev, 4, 3, T, X, Mf] unit Ritz vectors of Q_W
    ev_signs: jax.Array  # [n_ev] sign(lambda_i), field real dtype
    coeffs: tuple = dataclasses.field(metadata=dict(static=True))
    lo2: float = dataclasses.field(metadata=dict(static=True))
    hi2: float = dataclasses.field(metadata=dict(static=True))
    params: OverlapParams = dataclasses.field(metadata=dict(static=True))
    lat: Lattice = dataclasses.field(metadata=dict(static=True))
    ev_resid: float = dataclasses.field(default=0.0, metadata=dict(static=True))

    @property
    def sign_err(self) -> float:
        """Max |x*p(x^2) - 1| over the approximation interval — the
        guaranteed sign-function (= chirality) accuracy off the deflated
        subspace."""
        x = np.sqrt(np.linspace(self.lo2, self.hi2, 4001))
        return float(np.max(np.abs(x * chebyshev_eval(np.asarray(self.coeffs), x * x, self.lo2, self.hi2) - 1.0)))


def _qw(u: jax.Array, psi: jax.Array, params: OverlapParams, lat: Lattice) -> jax.Array:
    return apply_gamma5(d_full(u, psi, params.kernel, lat))


def make_overlap(
    u: jax.Array,
    params: OverlapParams,
    lat: Lattice,
    key: jax.Array | None = None,
    eps: float | None = None,
) -> OverlapSetup:
    """Build the per-configuration overlap setup: Lanczos low modes of Q_W,
    spectral interval of the complement, Chebyshev coefficients of 1/sqrt.

    Passing `eps` overrides the polynomial degree with the smallest degree
    whose measured sign error on [lo, hi] is below eps (like the reference
    choosing the polynomial from a target accuracy)."""
    from tmlqcd_tpu.solvers.lanczos import lanczos_herm

    if key is None:
        key = jax.random.key(11)
    from tmlqcd_tpu import rng as _rng

    shape = (4, 3) + lat.site_shape
    v0 = _rng.normal_spinor(key, shape, u.dtype)
    qw = jax.jit(lambda x: _qw(u, x, params, lat))
    q2 = lambda x: qw(qw(x))

    # Lanczos on Q^2 (NOT Q): the sign-relevant smallest-|lambda| modes are
    # INTERIOR eigenvalues of the indefinite Q but EXTREMAL ones of Q^2 —
    # exactly the reference's strategy (eigenvalues.c computes low modes of
    # the squared kernel, the sign comes from the Rayleigh quotient of Q).
    steps = params.lanczos_steps or max(8 * params.n_ev, 60)
    alphas, betas, basis = lanczos_herm(q2, v0, steps)
    if betas.size:
        theta2, s = np.linalg.eigh(np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1))
    else:
        theta2, s = alphas.copy(), np.eye(len(alphas))
    order = np.argsort(theta2)  # Q^2 >= 0: ascending == ascending magnitude

    n_ev = min(params.n_ev, max(len(theta2) - 1, 0))
    ev_resid = 0.0
    if n_ev:
        coeff = jnp.asarray(s[:, order[:n_ev]].T, basis.dtype)
        evecs = jnp.tensordot(coeff, basis, axes=1)
        # re-normalize (roundoff) — deflation projectors must be isometric
        nrm = jnp.sqrt(jnp.sum(jnp.abs(evecs) ** 2, axis=tuple(range(1, evecs.ndim)), keepdims=True))
        evecs = evecs / nrm.astype(evecs.dtype)
        # signs from Rayleigh quotients of Q; residual |Q v - <v,Qv> v|
        # measures how invariant the deflated subspace really is
        signs_l, resid_l = [], []
        for i in range(n_ev):
            vi = evecs[i]
            qv = qw(vi)
            th = float(jnp.sum(jnp.conj(vi) * qv).real)
            ri = float(jnp.linalg.norm(qv - jnp.asarray(th, vi.real.dtype) * vi))
            signs_l.append(np.sign(th) if th != 0.0 else 1.0)
            resid_l.append(ri)
        signs = jnp.asarray(np.asarray(signs_l), u.real.dtype)
        ev_resid = float(np.max(resid_l))
    else:
        evecs = jnp.zeros((0,) + shape, u.dtype)
        signs = jnp.zeros((0,), u.real.dtype)

    # complement interval on Q^2: the first UNdeflated Ritz value (biased
    # high — pad down hard) to the top Ritz value (biased low — pad up).
    th_sorted = theta2[order]
    lo2 = float(max(th_sorted[n_ev], 0.0) * 0.5) if len(th_sorted) > n_ev else 1e-6
    lo2 = max(lo2, 1e-12)
    hi2 = float(np.max(th_sorted) * 1.5)

    if eps is not None:
        degree, err = 8, np.inf
        while degree < 4096 and err > eps:
            degree *= 2
            c = chebyshev_coeffs(lambda x: 1.0 / np.sqrt(x), degree, lo2, hi2)
            x = np.sqrt(np.linspace(lo2, hi2, 4001))
            err = np.max(np.abs(x * chebyshev_eval(c, x * x, lo2, hi2) - 1.0))
        coeffs = c
    else:
        coeffs = chebyshev_coeffs(lambda x: 1.0 / np.sqrt(x), params.degree, lo2, hi2)

    return OverlapSetup(
        u=u,
        evecs=evecs,
        ev_signs=signs,
        coeffs=tuple(float(c) for c in coeffs),
        lo2=lo2,
        hi2=hi2,
        params=params,
        lat=lat,
        ev_resid=ev_resid,
    )


def _defl_project(setup: OverlapSetup, psi: jax.Array):
    """(coefficients <v_i, psi>, psi - V V^+ psi)."""
    if setup.evecs.shape[0] == 0:
        return None, psi
    axes = tuple(range(1, setup.evecs.ndim))
    c = jnp.sum(jnp.conj(setup.evecs) * psi[None], axis=axes)  # [n_ev]
    shape = (-1,) + (1,) * (psi.ndim)
    proj = jnp.sum(c.reshape(shape) * setup.evecs, axis=0)
    return c, psi - proj


def sign_q(setup: OverlapSetup, psi: jax.Array) -> jax.Array:
    """sign(Q_W) psi: exact on the deflated low modes, Q * p(Q^2) on the
    orthogonal complement (reference: Dov_psi.c's `norm_X`/Chebyshev path +
    the projector sum over eigenvectors)."""
    qw = lambda x: _qw(setup.u, x, setup.params, setup.lat)
    q2 = lambda x: qw(qw(x))
    c, perp = _defl_project(setup, psi)
    t = chebyshev_apply(q2, np.asarray(setup.coeffs), perp, setup.lo2, setup.hi2)
    s = qw(t)
    if c is not None:
        # project the polynomial part back onto the complement: with inexact
        # Ritz vectors the one-sided P_perp Q p(Q^2) leaks into the deflated
        # subspace and would break hermiticity; the symmetrized
        # P_perp Q p(Q^2) P_perp + sum_i sign_i v_i v_i^+ is exactly
        # hermitian for ANY subspace quality (the residual only costs
        # sign accuracy, tracked by setup.ev_resid).
        _, s = _defl_project(setup, s)
        shape = (-1,) + (1,) * (psi.ndim)
        sc = c * setup.ev_signs.astype(c.real.dtype)
        s = s + jnp.sum(sc.reshape(shape) * setup.evecs, axis=0)
    return s


def dov_psi(setup: OverlapSetup, psi: jax.Array) -> jax.Array:
    """D_ov(m) psi = (rho + m/2) psi + (rho - m/2) gamma5 sign(Q_W) psi
    (reference: Dov_psi.c `Dov_psi`)."""
    p = setup.params
    a = jnp.asarray(p.rho + 0.5 * p.m, psi.real.dtype)
    b = jnp.asarray(p.rho - 0.5 * p.m, psi.real.dtype)
    return a * psi + b * apply_gamma5(sign_q(setup, psi))


def dov_dagger_psi(setup: OverlapSetup, psi: jax.Array) -> jax.Array:
    """D_ov^+ = gamma5 D_ov gamma5 (gamma5-hermiticity; holds because
    sign(Q_W) is hermitian)."""
    return apply_gamma5(dov_psi(setup, apply_gamma5(psi)))


def gw_defect(setup: OverlapSetup, psi: jax.Array) -> jax.Array:
    """|{gamma5, D} psi - D gamma5 D psi / rho| / |psi| at m = 0 — the
    Ginsparg-Wilson violation of the approximate sign function (the
    reference's `ov_check_ginsparg_wilson_relation`, test/overlaptests.c)."""
    s0 = dataclasses.replace(setup, params=dataclasses.replace(setup.params, m=0.0))
    d = lambda x: dov_psi(s0, x)
    lhs = apply_gamma5(d(psi)) + d(apply_gamma5(psi))
    rhs = d(apply_gamma5(d(psi))) / jnp.asarray(setup.params.rho, psi.real.dtype)
    num = jnp.sqrt(jnp.sum(jnp.abs(lhs - rhs) ** 2))
    den = jnp.sqrt(jnp.sum(jnp.abs(psi) ** 2))
    return num / den


def invert_overlap(
    setup: OverlapSetup,
    b: jax.Array,
    tol: float = 1e-8,
    maxiter: int = 500,
    solver: str = "sumr",
):
    """Solve D_ov(m) x = b (full lattice, unpreconditioned — the overlap
    diagonal is dense in the sign function, so there is no cheap e/o Schur
    complement; reference: invert.c OVERLAP branch).

    solver:
      'sumr'  — shifted-unitary minimal residual on D = zeta + rho_s V with
                V = gamma5 sign(Q) unitary (reference: solver/sumr.c);
                ONE sign application per iteration.
      'cgne'  — CG on D^+ D x = D^+ b (gamma5-hermiticity gives D^+ for
                free); TWO sign applications per iteration but unconditional
                robustness.
    """
    p = setup.params
    if solver == "sumr":
        from tmlqcd_tpu.solvers.sumr import sumr

        zeta = p.rho + 0.5 * p.m
        rho_s = p.rho - 0.5 * p.m
        mv_u = lambda x: apply_gamma5(sign_q(setup, x))
        return sumr(mv_u, b, zeta=zeta, rho=rho_s, tol=tol, maxiter=maxiter)
    from tmlqcd_tpu.solvers.cg import cg

    nrm = lambda x: dov_dagger_psi(setup, dov_psi(setup, x))
    return cg(nrm, dov_dagger_psi(setup, b), tol=tol, maxiter=maxiter)
