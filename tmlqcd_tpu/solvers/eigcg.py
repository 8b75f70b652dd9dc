"""eigCG / incremental eigCG: CG that harvests approximate low eigenpairs
from its own iteration at zero extra matvec cost, and deflates subsequent
right-hand sides with them.

Reference: solver/eigcg.c + the incremental eigCG driver (`incr_eigcg`,
survey §2.6 solver enum INCREIGCG) — the reference uses it for propagator
workflows (many right-hand sides against one gauge configuration), where the
first solves pay full price and later solves start from a Galerkin projection
onto the accumulated low-mode subspace, cutting iterations several-fold.

Algorithm (Stathopoulos & Orginos, arXiv:0707.0131, re-derived here):

* CG's residuals are scaled Lanczos vectors of A; the Lanczos tridiagonal is
  free from the CG scalars:  T[k,k] = 1/alpha_k + beta_{k-1}/alpha_{k-1},
  T[k,k+1] = -sqrt(beta_k)/alpha_k.
* Keep a window of m normalized residuals V.  When full, restart the window
  thick-style with the nev lowest Ritz vectors of T_m AND of T_{m-1}
  (the two-basis trick is what lets locked pairs keep improving): combine,
  orthonormalize the coefficient vectors, rediagonalize the projected T, and
  shrink V to 2 nev Ritz vectors.  The next Lanczos vector couples to the
  restarted block through the old off-diagonal times the last row of the
  basis-change matrix — after which T grows tridiagonally again.
* The CG recurrence itself is completely untouched (same x, r, p updates).

Host-loop implementation: each iteration is one jitted matvec + fused vector
updates; the small T bookkeeping runs in numpy f64.  This is setup-grade
code for the serving path (inverter), like the reference's — not meant to
sit inside a jitted HMC trajectory.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["eigcg", "EigCGResult", "DeflationBasis", "incr_eigcg_solve"]


def _nrm2(v):
    return float(jnp.sum(v.real.astype(jnp.float64) ** 2 + v.imag.astype(jnp.float64) ** 2))


def _dotc(a, b):
    ar, ai = a.real.astype(jnp.float64), a.imag.astype(jnp.float64)
    br, bi = b.real.astype(jnp.float64), b.imag.astype(jnp.float64)
    return complex(float(jnp.sum(ar * br + ai * bi)), float(jnp.sum(ar * bi - ai * br)))


@dataclasses.dataclass
class EigCGResult:
    x: jax.Array
    iterations: int
    residual_sq: float
    ritz_vectors: list  # harvested (approx) low eigenvectors of A
    ritz_values: np.ndarray


@dataclasses.dataclass
class DeflationBasis:
    """Accumulated orthonormal low-mode basis U with projected operator
    H = U^+ A U (built exactly with one matvec per accepted vector)."""

    vectors: list
    h: np.ndarray  # [n, n] hermitian

    @classmethod
    def empty(cls) -> "DeflationBasis":
        return cls(vectors=[], h=np.zeros((0, 0), np.complex128))

    def galerkin_x0(self, b: jax.Array) -> Optional[jax.Array]:
        """x0 = U H^{-1} U^+ b — the init-CG deflation of the next rhs."""
        if not self.vectors:
            return None
        c = np.array([_dotc(v, b) for v in self.vectors])
        y = np.linalg.solve(self.h, c)
        x0 = None
        for yi, v in zip(y, self.vectors):
            t = jnp.asarray(yi, v.dtype) * v
            x0 = t if x0 is None else x0 + t
        return x0

    def extend(self, matvec: Callable, candidates: list, max_vectors: int) -> None:
        """Orthonormalize candidates against U and append (with their exact
        H rows) until max_vectors (reference: the incremental accumulation
        across right-hand sides)."""
        for v in candidates:
            if len(self.vectors) >= max_vectors:
                return
            w = v
            for _ in range(2):
                for u in self.vectors:
                    w = w - jnp.asarray(_dotc(u, w), w.dtype) * u
            nn = np.sqrt(_nrm2(w))
            if nn < 1e-8:
                continue  # linearly dependent with existing basis
            w = w / jnp.asarray(nn, w.real.dtype)
            aw = matvec(w)
            row = np.array([_dotc(u, aw) for u in self.vectors])  # U^+ A w
            d = _dotc(w, aw)
            n = len(self.vectors)
            h = np.zeros((n + 1, n + 1), np.complex128)
            h[:n, :n] = self.h
            h[:n, n] = row
            h[n, :n] = row.conj()
            h[n, n] = d
            self.h = h
            self.vectors.append(w)


def eigcg(
    matvec: Callable,
    b: jax.Array,
    nev: int = 4,
    m: int = 24,
    tol: float = 1e-8,
    maxiter: int = 1000,
    x0: Optional[jax.Array] = None,
    rel_prec: bool = True,
) -> EigCGResult:
    """One eigCG solve: plain CG trajectory + windowed Ritz harvesting.

    Returns the solution plus up to 2*nev approximate low eigenpairs of A
    (unit-norm vectors, Ritz values) harvested for free."""
    assert m >= 2 * nev + 2, "window m must exceed 2*nev+1"
    mv = jax.jit(matvec)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - mv(x) if x0 is not None else b
    p = r
    rsq = _nrm2(r)
    b_sq = _nrm2(b)
    target = tol * tol * (b_sq if rel_prec else 1.0)

    # Lanczos window bookkeeping (numpy f64 scalars, device vectors)
    V: list = []
    T = np.zeros((m, m), np.float64)
    k = 0  # current window size
    alpha_prev, beta_prev = 1.0, 0.0
    harvested: list = []
    theta_out = np.zeros(0)

    it = 0
    while it < maxiter and rsq > target:
        # -- Lanczos side: append normalized residual to the window
        v = r / jnp.asarray(np.sqrt(rsq), r.real.dtype)
        V.append(v)
        k += 1
        ap = mv(p)
        pap = float(jnp.sum((jnp.conj(p) * ap).real.astype(jnp.float64)))
        alpha = rsq / pap
        # T diagonal from CG scalars
        T[k - 1, k - 1] = 1.0 / alpha + beta_prev / alpha_prev

        x = x + jnp.asarray(alpha, p.real.dtype) * p
        r_new = r - jnp.asarray(alpha, p.real.dtype) * ap
        rsq_new = _nrm2(r_new)
        beta = rsq_new / rsq
        if k < m:
            T[k - 1, k] = T[k, k - 1] = -np.sqrt(beta) / alpha

        if k == m:
            # thick restart: nev lowest Ritz of T_m and of T_{m-1}
            tm = T[:m, :m]
            w1, y1 = np.linalg.eigh(tm)
            w2, y2 = np.linalg.eigh(tm[: m - 1, : m - 1])
            y2p = np.zeros((m, nev))
            y2p[: m - 1, :] = y2[:, :nev]
            q, _ = np.linalg.qr(np.concatenate([y1[:, :nev], y2p], axis=1))
            h = q.T @ tm @ q
            theta, z = np.linalg.eigh(h)
            qz = q @ z  # [m, 2nev]
            nkeep = qz.shape[1]
            # rotate the window: V <- V qz
            newV = []
            for j in range(nkeep):
                acc = None
                for i in range(m):
                    t_ = jnp.asarray(qz[i, j], V[i].dtype) * V[i]
                    acc = t_ if acc is None else acc + t_
                newV.append(acc)
            # coupling of the NEXT Lanczos vector to the restarted block:
            # the old subdiagonal t_m = -sqrt(beta)/alpha through qz's last row
            tmv = -np.sqrt(beta) / alpha
            T.fill(0.0)
            T[:nkeep, :nkeep] = np.diag(theta)
            T[nkeep, :nkeep] = tmv * qz[m - 1, :]
            T[:nkeep, nkeep] = T[nkeep, :nkeep]
            V = newV
            k = nkeep
            theta_out = theta
            harvested = list(newV)

        r, rsq = r_new, rsq_new
        p = r + jnp.asarray(beta, r.real.dtype) * p
        alpha_prev, beta_prev = alpha, beta
        it += 1

    if not harvested and k > 1:
        # short solve that never filled the window: harvest what exists
        tm = T[:k, :k].copy()
        # the last assigned off-diagonal couples to the (k+1)-th vector
        tm_local = tm
        w1, y1 = np.linalg.eigh(tm_local)
        take = min(nev, k)
        theta_out = w1[:take]
        for j in range(take):
            acc = None
            for i in range(k):
                t_ = jnp.asarray(y1[i, j], V[i].dtype) * V[i]
                acc = t_ if acc is None else acc + t_
            harvested.append(acc)

    return EigCGResult(
        x=x, iterations=it, residual_sq=rsq, ritz_vectors=harvested,
        ritz_values=np.asarray(theta_out),
    )


def incr_eigcg_solve(
    matvec: Callable,
    bs: list,
    nev: int = 4,
    m: int = 24,
    max_vectors: int = 32,
    tol: float = 1e-8,
    maxiter: int = 1000,
    basis: Optional[DeflationBasis] = None,
):
    """Incremental eigCG over a sequence of right-hand sides (reference:
    incr_eigcg): each solve is init-deflated by the accumulated basis and
    contributes its harvested Ritz vectors to it.

    Returns (solutions, iteration counts, basis) — pass `basis` back in to
    keep accumulating across calls (e.g. several sources on one gauge)."""
    if basis is None:
        basis = DeflationBasis.empty()
    xs, iters = [], []
    for b in bs:
        x0 = basis.galerkin_x0(b)
        res = eigcg(matvec, b, nev=nev, m=m, tol=tol, maxiter=maxiter, x0=x0)
        xs.append(res.x)
        iters.append(res.iterations)
        if len(basis.vectors) < max_vectors and res.ritz_vectors:
            basis.extend(matvec, res.ritz_vectors[: 2 * nev], max_vectors)
    return xs, iters, basis
