"""Krylov solver tests against the twisted-mass normal operator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.solvers import bicgstab, cg, cg_multishift

DT = jnp.complex64
LAT = Lattice((4, 4, 4, 4))
PARAMS = w.DiracParams(kappa=0.12, mu=0.05)


@pytest.fixture(scope="module")
def setup():
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, DT)
    ueo = pack_gauge_eo(u, LAT)
    ph = w.boundary_phases(PARAMS, LAT)
    b = rng.normal_spinor(jax.random.key(1), (4, 3) + LAT.eo_site_shape, DT)
    qpm = lambda x: w.q_hat_pm(ueo, x, PARAMS, LAT, ph)
    mhat = lambda x: w.m_hat(ueo, x, PARAMS, LAT, ph, +1.0)
    return qpm, mhat, b


def test_cg_converges(setup):
    qpm, _, b = setup
    res = jax.jit(lambda b: cg(qpm, b, tol=1e-6, maxiter=500))(b)
    rel = float(jnp.linalg.norm(qpm(res.x) - b) / jnp.linalg.norm(b))
    assert rel < 5e-6
    assert int(res.iterations) < 100


def test_cg_absolute_precision(setup):
    qpm, _, b = setup
    res = cg(qpm, b, tol=1e-4, maxiter=500, rel_prec=False)
    assert float(res.residual_sq) <= 1e-8


def test_multishift_cg(setup):
    qpm, _, b = setup
    shifts = jnp.array([0.0, 0.01, 0.1, 1.0])
    ms = jax.jit(lambda b: cg_multishift(qpm, b, shifts, tol=1e-6, maxiter=500))(b)
    for i, s in enumerate(np.asarray(shifts)):
        ax = qpm(ms.x[i]) + float(s) * ms.x[i]
        rel = float(jnp.linalg.norm(ax - b) / jnp.linalg.norm(b))
        assert rel < 2e-5, (i, s, rel)


def test_bicgstab_nonhermitian(setup):
    _, mhat, b = setup
    res = jax.jit(lambda b: bicgstab(mhat, b, tol=1e-6, maxiter=500))(b)
    rel = float(jnp.linalg.norm(mhat(res.x) - b) / jnp.linalg.norm(b))
    assert rel < 5e-6


def test_cgs_nonhermitian(setup):
    """CGS (reference: solver/cgs_real.c) solves the unsquared operator."""
    from tmlqcd_tpu.solvers.cgs import cgs

    _, mhat, b = setup
    res = jax.jit(lambda b: cgs(mhat, b, tol=1e-6, maxiter=500))(b)
    rel = float(jnp.linalg.norm(mhat(res.x) - b) / jnp.linalg.norm(b))
    assert rel < 5e-6


def test_cg_with_initial_guess(setup):
    """Chronological-guess contract: a good x0 cuts iterations
    (reference: solver/chrono_guess.c)."""
    qpm, _, b = setup
    full = cg(qpm, b, tol=1e-6, maxiter=500)
    warm = cg(qpm, b, x0=full.x, tol=1e-6, maxiter=500)
    assert int(warm.iterations) <= 2


def test_incr_eigcg_dense():
    """Incremental eigCG (reference: solver/eigcg.c + incr_eigcg): Ritz
    pairs harvested from earlier solves deflate later right-hand sides —
    iterations must drop substantially across an rhs sequence."""
    from tmlqcd_tpu.solvers.eigcg import incr_eigcg_solve

    nprng = np.random.default_rng(1)
    n = 400
    q, _ = np.linalg.qr(nprng.normal(size=(n, n)) + 1j * nprng.normal(size=(n, n)))
    ev = np.concatenate([np.linspace(1e-3, 5e-3, 8), np.linspace(0.5, 10.0, n - 8)])
    a = (q * ev) @ q.conj().T
    a = (a + a.conj().T) / 2
    mv = lambda x: jnp.asarray(a, jnp.complex128) @ x
    bs = [
        jnp.asarray(nprng.normal(size=n) + 1j * nprng.normal(size=n), jnp.complex128)
        for _ in range(5)
    ]
    xs, iters, basis = incr_eigcg_solve(
        mv, bs, nev=6, m=30, max_vectors=24, tol=1e-8, maxiter=3000
    )
    for b, x in zip(bs, xs):
        rel = float(jnp.linalg.norm(mv(x) - b) / jnp.linalg.norm(b))
        assert rel < 1e-7, rel
    # deflation must cut iterations by at least ~2x once the basis is built
    assert iters[-1] < 0.5 * iters[0], iters
    assert len(basis.vectors) > 0
