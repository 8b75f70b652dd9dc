"""DFLGCR: deflation-V-cycle-preconditioned GCR through the dispatch seam
(reference: solver/solver_types.h DFLGCR next to DFLFGMRES; routed via
monomial_solve.c-style dispatch)."""

import jax
import jax.numpy as jnp

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.solvers import dispatch
from tmlqcd_tpu.solvers.deflation import setup_deflation

DT = jnp.complex64
LAT = Lattice((4, 4, 4, 4))
PARAMS = w.DiracParams(kappa=0.16, mu=0.005)


def test_dflgcr_via_dispatch_converges():
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, DT)
    ueo = pack_gauge_eo(u, LAT)
    ph = w.boundary_phases(PARAMS, LAT)
    mhat = lambda x: w.m_hat(ueo, x, PARAMS, LAT, ph, +1.0)
    b = rng.normal_spinor(jax.random.key(1), (4, 3) + LAT.eo_site_shape, DT)
    setup = setup_deflation(
        mhat, b.shape, jax.random.key(2), n_vectors=6, blocks=(2, 2, 2),
        inv_iters=3, smooth_iters=4,
    )
    x, iters, res_sq = dispatch.solve_degenerate(
        mhat, b, solver="dflgcr", tol=1e-8, maxiter=400,
        deflation_setup=setup, restart=10,
    )
    rel = float(jnp.linalg.norm(mhat(x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-6, rel
