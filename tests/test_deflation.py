"""2-level deflation/MG preconditioner tests (reference: dfl_projector.c,
little_D.c; the DFLFGMRES solver stack)."""

import jax
import jax.numpy as jnp

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.solvers.deflation import deflated_fgmres, setup_deflation, vcycle
from tmlqcd_tpu.solvers.krylov import fgmres

DT = jnp.complex64
LAT = Lattice((4, 4, 4, 4))
# small twisted mass -> ill-conditioned Mhat, where deflation should help
PARAMS = w.DiracParams(kappa=0.16, mu=0.005)


def _mhat_and_rhs():
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, DT)
    ueo = pack_gauge_eo(u, LAT)
    ph = w.boundary_phases(PARAMS, LAT)
    mhat = lambda x: w.m_hat(ueo, x, PARAMS, LAT, ph, +1.0)
    b = rng.normal_spinor(jax.random.key(1), (4, 3) + LAT.eo_site_shape, DT)
    return mhat, b


def test_deflated_fgmres_converges_and_beats_plain():
    mhat, b = _mhat_and_rhs()
    setup = setup_deflation(
        mhat, b.shape, jax.random.key(2), n_vectors=6, blocks=(2, 2, 2),
        inv_iters=3, smooth_iters=4,
    )
    plain = fgmres(mhat, b, tol=1e-8, restart=10, max_restarts=40)
    defl = deflated_fgmres(mhat, b, setup, tol=1e-8, restart=10, max_restarts=40)
    rel = float(jnp.linalg.norm(mhat(defl.x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-6, rel
    # each restart costs (restart) matvecs either way; deflation must reduce
    # the number of restart cycles needed
    assert int(defl.iterations) <= int(plain.iterations)


def test_vcycle_reduces_residual():
    mhat, b = _mhat_and_rhs()
    setup = setup_deflation(
        mhat, b.shape, jax.random.key(3), n_vectors=6, blocks=(2, 2, 2),
    )
    c = vcycle(setup, mhat, b)
    r = b - mhat(c)
    assert float(jnp.linalg.norm(r)) < float(jnp.linalg.norm(b))
