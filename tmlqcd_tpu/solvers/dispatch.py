"""Solver dispatch: one seam where all solvers (and future external
accelerated backends) plug in.

Reference: solver/monomial_solve.c (`solve_degenerate`, `solve_mms_tm`) +
the ExternalInverter enum routing to internal solvers, QUDA, or DDalphaAMG
(survey §2.6 "Solver dispatch": "Single seam where external accelerators
plug in — replicate this seam on TPU").

Internal backends: cg | mixedcg | bicgstab | fgmres | gcr | mr | dfl
(deflation-preconditioned FGMRES).  Register additional backends with
`register_solver` — the tmLQCD-input `Solver = <name>` key resolves here.
"""

from __future__ import annotations

from typing import Callable

import jax

__all__ = ["solve_degenerate", "solve_mms", "register_solver", "SOLVERS"]


def _cg(matvec, b, tol, maxiter, **kw):
    from tmlqcd_tpu.solvers.cg import cg

    r = cg(matvec, b, tol=tol, maxiter=maxiter, x0=kw.get("x0"))
    return r.x, r.iterations, r.residual_sq


def _mixedcg(matvec, b, tol, maxiter, **kw):
    from tmlqcd_tpu.solvers.mixed_cg import mixed_cg

    import jax.numpy as jnp

    r = mixed_cg(matvec, b, tol=tol, max_inner=maxiter,
                 matvec_lo=kw.get("matvec_lo"),
                 lo_dtype=kw.get("lo_dtype", jnp.complex64),
                 x0=kw.get("x0"),
                 inner_tol=kw.get("inner_tol", 1e-2))
    return r.x, r.inner_iterations, r.residual_sq


def _rgmixedcg(matvec, b, tol, maxiter, **kw):
    from tmlqcd_tpu.solvers.mixed_cg import rg_mixed_cg

    import jax.numpy as jnp

    r = rg_mixed_cg(matvec, b, tol=tol, maxiter=maxiter,
                    matvec_lo=kw.get("matvec_lo"),
                    lo_dtype=kw.get("lo_dtype", jnp.complex64),
                    x0=kw.get("x0"),
                    delta=kw.get("delta", 0.01))
    return r.x, r.inner_iterations, r.residual_sq


def _bicgstab(matvec, b, tol, maxiter, **kw):
    from tmlqcd_tpu.solvers.bicgstab import bicgstab

    r = bicgstab(matvec, b, tol=tol, maxiter=maxiter)
    return r.x, r.iterations, r.residual_sq


def _cgs(matvec, b, tol, maxiter, **kw):
    from tmlqcd_tpu.solvers.cgs import cgs

    r = cgs(matvec, b, tol=tol, maxiter=maxiter, x0=kw.get("x0"))
    return r.x, r.iterations, r.residual_sq


def _fgmres(matvec, b, tol, maxiter, **kw):
    from tmlqcd_tpu.solvers.krylov import fgmres

    r = fgmres(matvec, b, tol=tol, restart=kw.get("restart", 20),
               max_restarts=max(maxiter // kw.get("restart", 20), 1),
               precond=kw.get("precond"))
    return r.x, r.iterations, r.residual_sq


def _gcr(matvec, b, tol, maxiter, **kw):
    from tmlqcd_tpu.solvers.krylov import gcr

    r = gcr(matvec, b, tol=tol, restart=kw.get("restart", 20),
            max_restarts=max(maxiter // kw.get("restart", 20), 1),
            precond=kw.get("precond"))
    return r.x, r.iterations, r.residual_sq


def _mr(matvec, b, tol, maxiter, **kw):
    from tmlqcd_tpu.solvers.krylov import mr

    r = mr(matvec, b, tol=tol, maxiter=maxiter)
    return r.x, r.iterations, r.residual_sq


def _dfl(matvec, b, tol, maxiter, **kw):
    from tmlqcd_tpu.solvers.deflation import vcycle

    setup = kw.get("deflation_setup")
    if setup is None:
        raise ValueError("solver 'dfl' needs deflation_setup=...")
    return _fgmres(matvec, b, tol, maxiter,
                   precond=lambda r: vcycle(setup, matvec, r),
                   restart=kw.get("restart", 20))


def _dflgcr(matvec, b, tol, maxiter, **kw):
    """GCR preconditioned by the deflation V-cycle (reference: the DFLGCR
    solver type next to DFLFGMRES in solver/solver_types.h)."""
    from tmlqcd_tpu.solvers.deflation import vcycle

    setup = kw.get("deflation_setup")
    if setup is None:
        raise ValueError("solver 'dflgcr' needs deflation_setup=...")
    return _gcr(matvec, b, tol, maxiter,
                precond=lambda r: vcycle(setup, matvec, r),
                restart=kw.get("restart", 20))


SOLVERS: dict[str, Callable] = {
    "cg": _cg,
    "mixedcg": _mixedcg,
    "rgmixedcg": _rgmixedcg,
    "bicgstab": _bicgstab,
    "cgs": _cgs,
    "fgmres": _fgmres,
    "gmres": _fgmres,
    "gcr": _gcr,
    "mr": _mr,
    "dfl": _dfl,
    "dflfgmres": _dfl,
    "dflgcr": _dflgcr,
}


def register_solver(name: str, fn: Callable) -> None:
    """Plug in an external/accelerated solver backend (the QUDA/DDalphaAMG
    seam of the reference)."""
    SOLVERS[name.lower()] = fn


def solve_degenerate(matvec, b, solver: str = "cg", tol: float = 1e-10,
                     maxiter: int = 5000, **kw):
    """(x, iterations, |r|^2) — reference: solve_degenerate()."""
    try:
        fn = SOLVERS[solver.lower()]
    except KeyError:
        raise ValueError(f"unknown solver {solver!r}; have {sorted(SOLVERS)}")
    return fn(matvec, b, tol, maxiter, **kw)


def solve_mms(matvec, b, shifts, tol: float = 1e-10, maxiter: int = 5000):
    """Multi-shift solve (reference: solve_mms_tm/solve_mms_nd)."""
    from tmlqcd_tpu.solvers.multishift import cg_multishift

    r = cg_multishift(matvec, b, shifts, tol=tol, maxiter=maxiter)
    return r.x, r.iterations, r.residual_sq
