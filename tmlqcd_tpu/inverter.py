"""Propagator inversion — the "serving" path: solve M x = b on the full
lattice via even/odd Schur preconditioning + Krylov solvers.

Reference: invert_eo.c (`invert_eo`: source transform, odd solve,
even reconstruction), invert.c driver, operator.c registry (survey §3.3).

Pipeline for the twisted-mass (clover) Wilson operator M (2k normalization):

    M = [[M_ee, M_eo], [M_oe, M_oo]],  M_eo = -kappa H_eo
    1. bhat   = b_o - M_oe M_ee^{-1} b_e
    2. solve  Mhat x_o = bhat  via the normal equations
              Qhat_pm x_o = Qhat_- g5 bhat       (CG / mixed CG)
    3. x_e    = M_ee^{-1} (b_e - M_eo x_o)

The whole inversion jits to a single XLA program; sources/solutions are full
lattice spinors [4, 3, T, X, Y*Z].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tmlqcd_tpu.gamma import apply_gamma5
from tmlqcd_tpu.lattice import EVEN, ODD, Lattice, eo_pack, eo_unpack, pack_gauge_eo
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.solvers.cg import cg
from tmlqcd_tpu.solvers.mixed_cg import mixed_cg

__all__ = ["InvertResult", "invert_eo", "invert_eo_rhs", "invert_clover_eo",
           "invert_doublet_eo"]


@dataclasses.dataclass
class InvertResult:
    x: jax.Array  # full-lattice solution [4,3,T,X,Mf]
    iterations: jax.Array
    residual_sq: jax.Array  # normal-equation residual of the odd solve


jax.tree_util.register_dataclass(
    InvertResult, data_fields=["x", "iterations", "residual_sq"], meta_fields=[]
)


def make_deflation_setup(
    u: jax.Array,
    params: w.DiracParams,
    lat: Lattice,
    n_vectors: int = 8,
    blocks: tuple[int, int, int] = (2, 2, 2),
    key=None,
    **kw,
):
    """Build the 2-level deflation/MG setup for Mhat(params) ONCE per gauge
    configuration; pass it to `invert_eo(solver='dflfgmres',
    deflation_setup=...)` and reuse across sources (reference: the
    DDalphaAMG_interface.c setup/update lifecycle + dfl_projector.c,
    survey §2.6)."""
    from tmlqcd_tpu.solvers.deflation import setup_deflation

    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params, lat)
    mv = lambda x: w.m_hat(ueo, x, params, lat, ph, +1.0)
    if key is None:
        key = jax.random.key(4242)
    shape = (4, 3) + lat.eo_site_shape
    return setup_deflation(mv, shape, key, n_vectors=n_vectors, blocks=blocks, **kw)


def invert_eo(
    u: jax.Array,
    b: jax.Array,
    params: w.DiracParams,
    lat: Lattice,
    tol: float = 1e-10,
    maxiter: int = 5000,
    solver: str = "cg",
    deflation_setup=None,
) -> InvertResult:
    """Solve M(params) x = b (full lattice) for the twisted-mass Wilson
    operator (reference: invert_eo.c).  solver: 'cg' | 'mixedcg' | 'fastcg'
    | 'fastmixed' | 'dflfgmres' | 'dflgcr' (2-level-MG-preconditioned
    flexible Krylov on Mhat directly — the DDalphaAMG path of config 4)."""
    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params, lat)
    kappa = jnp.asarray(params.kappa, b.real.dtype)

    b_e, b_o = eo_pack(b, lat)
    # bhat = b_o - M_oe Mee^{-1} b_e ;  M_oe = -kappa H_oe
    t = w.mee_inv_packed(b_e, params.mutld, +1.0)
    bhat = b_o + kappa * w.dslash_packed(ueo, t, ODD, lat, ph)

    qpm = lambda x: w.q_hat_pm(ueo, x, params, lat, ph)
    rhs = w.q_hat(ueo, apply_gamma5(bhat), params, lat, ph, -1.0)

    if solver in ("dflfgmres", "dflgcr", "dfl"):
        # MG-preconditioned flexible Krylov on the NON-squared Mhat — the
        # point of multigrid is avoiding the normal equations' squared
        # condition number at light quark mass (reference: invert routes
        # ExternalInverter=ddalphaamg solves on D, not on Q^2).
        from tmlqcd_tpu.solvers.deflation import vcycle
        from tmlqcd_tpu.solvers.krylov import fgmres, gcr

        mv = lambda x: w.m_hat(ueo, x, params, lat, ph, +1.0)
        setup = deflation_setup
        if setup is None:
            setup = make_deflation_setup(u, params, lat)
        kry = gcr if solver == "dflgcr" else fgmres
        # short cycles: the V-cycle preconditioner converges in O(5-10)
        # iterations, and a restart cannot early-exit mid-cycle — small m
        # wastes fewer preconditioner applications past convergence
        restart = 5
        res = kry(
            mv, bhat, precond=lambda r: vcycle(setup, mv, r),
            tol=tol, restart=restart, max_restarts=max(maxiter // restart, 1),
        )
        x_o, iters, rsq = res.x, res.iterations, res.residual_sq
    elif solver in ("fastcg", "fastmixed"):
        # production TPU path: CG iterates on split-f32 fields with the
        # Pallas dslash (ops/wilson_fast); CG's f64-accumulated dots are
        # plain real sums over the leading re/im axis.  'fastmixed' runs
        # the inner CG with the bf16 sloppy gauge copy (~1.2x faster
        # dslash) inside an f32 defect-correction outer loop
        # (reference: mixed_cg_her.c with _32 copies).
        from tmlqcd_tpu import parallel
        from tmlqcd_tpu.ops import wilson_fast as wf

        am = parallel.active_mesh()
        fg = wf.make_fast_gauge(u, params, lat)
        if am is not None:
            # domain-decomposed production path: every CG matvec runs the
            # sharded kernel with ppermute halos (reference: invert under
            # MPI decomposition, survey §3.3)
            mesh, t_ax, m_ax = am
            mv = lambda x2: wf.q_hat_pm_fast_shard(fg, x2, params, lat, mesh, t_ax, m_ax)
        else:
            mv = lambda x2: wf.q_hat_pm_fast(fg, x2, params, lat)
        if solver == "fastmixed":
            fg16 = wf.make_fast_gauge(u, params, lat, sloppy=True)
            if am is not None:
                mesh, t_ax, m_ax = am
                mv16 = lambda x2: wf.q_hat_pm_fast_shard(fg16, x2, params, lat, mesh, t_ax, m_ax)
            else:
                mv16 = lambda x2: wf.q_hat_pm_fast(fg16, x2, params, lat)
            res = mixed_cg(mv, wf.to_split(rhs), matvec_lo=mv16,
                           lo_dtype=jnp.float32, tol=tol, max_inner=maxiter)
            x_o = wf.from_split(res.x, b.dtype)
            iters, rsq = res.inner_iterations, res.residual_sq
        else:
            res = cg(mv, wf.to_split(rhs), tol=tol, maxiter=maxiter)
            x_o, iters, rsq = wf.from_split(res.x, b.dtype), res.iterations, res.residual_sq
    elif solver == "mixedcg":
        res = mixed_cg(qpm, rhs, tol=tol, max_inner=maxiter)
        x_o, iters, rsq = res.x, res.inner_iterations, res.residual_sq
    else:
        res = cg(qpm, rhs, tol=tol, maxiter=maxiter)
        x_o, iters, rsq = res.x, res.iterations, res.residual_sq

    # x_e = Mee^{-1} (b_e - M_eo x_o) = Mee^{-1} (b_e + kappa H_eo x_o)
    x_e = w.mee_inv_packed(
        b_e + kappa * w.dslash_packed(ueo, x_o, EVEN, lat, ph), params.mutld, +1.0
    )
    return InvertResult(x=eo_unpack(x_e, x_o, lat), iterations=iters, residual_sq=rsq)


def invert_eo_rhs(
    u: jax.Array,
    bs: jax.Array,
    params: w.DiracParams,
    lat: Lattice,
    tol: float = 1e-10,
    maxiter: int = 5000,
) -> InvertResult:
    """Batched propagator inversion: solve M x_r = b_r for all R sources at
    once — the Schur pipeline of invert_eo with the odd solve running as ONE
    batched CG on the multi-RHS Pallas operator, which reads the gauge
    stream once per tile and shares it across the batch (~2.3x per-source
    dslash throughput at R=12; reference: invert.c loops the 12 spin-color
    point-source columns as independent full-bandwidth cg_her solves).

    bs: [R, 4, 3, T, X, Mf] complex; c_sw selects the clover pipeline.
    Returns x [R, 4, 3, T, X, Mf]; residual_sq/iterations are per-side [R] /
    the max over sides."""
    from tmlqcd_tpu import parallel
    from tmlqcd_tpu.ops import wilson_fast as wf
    from tmlqcd_tpu.solvers.cg import cg_rhs

    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params, lat)
    kappa = jnp.asarray(params.kappa, bs.real.dtype)
    clov = params.c_sw != 0.0
    vm = jax.vmap
    am = parallel.active_mesh()

    if clov:
        from tmlqcd_tpu.ops import clover as cl

        sw_e, sw_o = cl.sw_blocks_eo(u, params.kappa, params.c_sw, lat)
        mee_inv = lambda x: cl.sw_inv_apply(sw_e, x, params.mutld, +1.0)
        qm = lambda x: cl.q_hat_clover(ueo, sw_e, sw_o, x, params, lat, ph, -1.0)
        fc = wf.make_fast_clover(u, params, lat)
        if am is not None:
            # domain-decomposed multi-RHS: the R axis rides the sharded
            # kernel builds (gauge stream read once per tile, halos batched)
            mesh, t_ax, m_ax = am
            mv = lambda x2: wf.q_hat_pm_clover_fast_shard(fc, x2, params, lat, mesh, t_ax, m_ax)
        else:
            mv = lambda x2: wf.q_hat_pm_clover_fast(fc, x2, params, lat)
    else:
        mee_inv = lambda x: w.mee_inv_packed(x, params.mutld, +1.0)
        qm = lambda x: w.q_hat(ueo, x, params, lat, ph, -1.0)
        fg = wf.make_fast_gauge(u, params, lat)
        if am is not None:
            mesh, t_ax, m_ax = am
            mv = lambda x2: wf.q_hat_pm_fast_shard(fg, x2, params, lat, mesh, t_ax, m_ax)
        else:
            mv = lambda x2: wf.q_hat_pm_fast(fg, x2, params, lat)

    b_e, b_o = vm(lambda b: eo_pack(b, lat))(bs)
    t = vm(mee_inv)(b_e)
    bhat = b_o + kappa * vm(lambda y: w.dslash_packed(ueo, y, ODD, lat, ph))(t)
    rhs = vm(lambda bh: qm(apply_gamma5(bh)))(bhat)

    res = cg_rhs(mv, wf.to_split_rhs(rhs), rhs_axis=3, tol=tol, maxiter=maxiter)
    x_o = wf.from_split_rhs(res.x, bs.dtype)

    x_e = vm(
        lambda be, xo: mee_inv(be + kappa * w.dslash_packed(ueo, xo, EVEN, lat, ph))
    )(b_e, x_o)
    x = vm(lambda xe, xo: eo_unpack(xe, xo, lat))(x_e, x_o)
    return InvertResult(x=x, iterations=res.iterations, residual_sq=res.residual_sq)


def invert_eo_increigcg(
    u: jax.Array,
    bs: list,
    params: w.DiracParams,
    lat: Lattice,
    tol: float = 1e-10,
    maxiter: int = 5000,
    nev: int = 6,
    m: int = 30,
    max_vectors: int = 48,
) -> list:
    """Sequence-of-sources inversion with INCREMENTAL EIGCG deflation
    (reference: solver/eigcg.c + incr_eigcg via solver_types INCREIGCG):
    each odd-sector CG harvests approximate low modes of Qhat_pm for free
    and later sources start from the Galerkin projection onto the
    accumulated basis — the propagator-workflow alternative to the batched
    multi-RHS solve (useful when sources arrive sequentially or memory
    forbids batching).

    Returns a list of InvertResult, one per source in `bs`."""
    from tmlqcd_tpu.solvers.eigcg import DeflationBasis, eigcg

    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params, lat)
    kappa = jnp.asarray(params.kappa, bs[0].real.dtype)
    qpm = lambda x: w.q_hat_pm(ueo, x, params, lat, ph)

    basis = DeflationBasis.empty()
    outs = []
    for b in bs:
        b_e, b_o = eo_pack(b, lat)
        t = w.mee_inv_packed(b_e, params.mutld, +1.0)
        bhat = b_o + kappa * w.dslash_packed(ueo, t, ODD, lat, ph)
        rhs = w.q_hat(ueo, apply_gamma5(bhat), params, lat, ph, -1.0)
        x0 = basis.galerkin_x0(rhs)
        res = eigcg(qpm, rhs, nev=nev, m=m, tol=tol, maxiter=maxiter, x0=x0)
        if len(basis.vectors) < max_vectors and res.ritz_vectors:
            basis.extend(qpm, res.ritz_vectors[: 2 * nev], max_vectors)
        x_o = res.x
        x_e = w.mee_inv_packed(
            b_e + kappa * w.dslash_packed(ueo, x_o, EVEN, lat, ph),
            params.mutld, +1.0,
        )
        outs.append(
            InvertResult(
                x=eo_unpack(x_e, x_o, lat),
                iterations=jnp.asarray(res.iterations),
                residual_sq=jnp.asarray(res.residual_sq),
            )
        )
    return outs


def invert_clover_eo(
    u: jax.Array,
    b: jax.Array,
    params: w.DiracParams,
    lat: Lattice,
    tol: float = 1e-10,
    maxiter: int = 5000,
    solver: str = "cg",
) -> InvertResult:
    """Twisted-clover inversion (reference: invert_clover_eo.c): same Schur
    pipeline with the clover M_ee/M_oo blocks."""
    from tmlqcd_tpu.ops import clover as cl

    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params, lat)
    kappa = jnp.asarray(params.kappa, b.real.dtype)
    sw_e, sw_o = cl.sw_blocks_eo(u, params.kappa, params.c_sw, lat)

    b_e, b_o = eo_pack(b, lat)
    t = cl.sw_inv_apply(sw_e, b_e, params.mutld, +1.0)
    bhat = b_o + kappa * w.dslash_packed(ueo, t, ODD, lat, ph)

    qpm = lambda x: cl.q_hat_pm_clover(ueo, sw_e, sw_o, x, params, lat, ph)
    rhs = cl.q_hat_clover(ueo, sw_e, sw_o, apply_gamma5(bhat), params, lat, ph, -1.0)

    if solver == "fastcg":
        from tmlqcd_tpu import parallel
        from tmlqcd_tpu.ops import wilson_fast as wf

        am = parallel.active_mesh()
        fc = wf.make_fast_clover(u, params, lat)
        if am is not None:
            mesh, t_ax, m_ax = am
            mv = lambda x2: wf.q_hat_pm_clover_fast_shard(fc, x2, params, lat, mesh, t_ax, m_ax)
        else:
            mv = lambda x2: wf.q_hat_pm_clover_fast(fc, x2, params, lat)
        res = cg(mv, wf.to_split(rhs), tol=tol, maxiter=maxiter)
        x_o, iters, rsq = wf.from_split(res.x, b.dtype), res.iterations, res.residual_sq
    elif solver == "mixedcg":
        res = mixed_cg(qpm, rhs, tol=tol, max_inner=maxiter)
        x_o, iters, rsq = res.x, res.inner_iterations, res.residual_sq
    else:
        res = cg(qpm, rhs, tol=tol, maxiter=maxiter)
        x_o, iters, rsq = res.x, res.iterations, res.residual_sq

    x_e = cl.sw_inv_apply(
        sw_e,
        b_e + kappa * w.dslash_packed(ueo, x_o, EVEN, lat, ph),
        params.mutld,
        +1.0,
    )
    return InvertResult(x=eo_unpack(x_e, x_o, lat), iterations=iters, residual_sq=rsq)


def invert_doublet_eo(
    u: jax.Array,
    b: jax.Array,
    params,
    lat: Lattice,
    tol: float = 1e-10,
    maxiter: int = 5000,
) -> InvertResult:
    """Solve the non-degenerate doublet system M_nd x = b for a flavor
    doublet source b [2, 4, 3, T, X, Y*Z] (reference: invert_doublet_eo.c,
    the DBTMWILSON operator path; params.c_sw != 0 selects the clover
    doublet — DBCLOVER, invert_clover_doublet_eo.c's role).

    Odd solve via the hermitian Q_nd = gamma5 tau1 Mhat_nd:
    Mhat x = bhat <=> Q_nd^2 x = Q_nd (g5 tau1 bhat)  (CG).
    """
    from tmlqcd_tpu.gamma import apply_gamma5 as g5
    from tmlqcd_tpu.ops import ndoublet as nd

    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params.wilson, lat)
    kappa = jnp.asarray(params.kappa, b.real.dtype)
    clov = params.c_sw != 0.0

    be0, bo0 = eo_pack(b[0], lat)
    be1, bo1 = eo_pack(b[1], lat)
    b_e = jnp.stack([be0, be1])
    b_o = jnp.stack([bo0, bo1])

    def hop(chi, p):
        return jnp.stack(
            [
                w.dslash_packed(ueo, chi[0], p, lat, ph),
                w.dslash_packed(ueo, chi[1], p, lat, ph),
            ]
        )

    if clov:
        from tmlqcd_tpu.ops import clover as cl

        sw_e, sw_o = cl.sw_blocks_eo(u, params.kappa, params.c_sw, lat)
        mee_inv = lambda chi: cl.mee_inv_nd_clover(
            sw_e, chi, params.mubar_t, params.epsbar_t, +1.0
        )
        qnd = lambda x: cl.q_nd_clover(ueo, sw_e, sw_o, x, params, lat, ph)
    else:
        mee_inv = lambda chi: nd.mee_inv_nd(chi, params.mubar_t, params.epsbar_t, +1.0)
        qnd = lambda x: nd.q_nd(ueo, x, params, lat, ph)

    bhat = b_o + kappa * hop(mee_inv(b_e), ODD)

    def g5tau1(chi):
        return jnp.stack([g5(chi[1]), g5(chi[0])])

    rhs = qnd(g5tau1(bhat))
    res = cg(lambda x: qnd(qnd(x)), rhs, tol=tol, maxiter=maxiter)
    x_o = res.x

    x_e = mee_inv(b_e + kappa * hop(x_o, EVEN))
    full = jnp.stack(
        [eo_unpack(x_e[0], x_o[0], lat), eo_unpack(x_e[1], x_o[1], lat)]
    )
    return InvertResult(x=full, iterations=res.iterations, residual_sq=res.residual_sq)
