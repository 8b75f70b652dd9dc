"""Multi-RHS kernel path: R right-hand sides on one gauge stream.

The multi-RHS build adds R as the innermost grid axis with gauge/clover
index maps that ignore it, so the dominant HBM stream is read once per tile
and amortized over the batch (reference: invert.c runs the 12 spin-color
source columns of a point-source propagator as independent full-bandwidth
cg_her solves — here they share one fused solve)."""

import jax
import jax.numpy as jnp
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import EVEN, Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import dslash_pallas as dp
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.ops import wilson_fast as wf

LAT = Lattice((4, 4, 4, 4))
PARAMS = w.DiracParams(kappa=0.15, mu=0.02)
R = 3


def _setup():
    ph = w.boundary_phases(PARAMS, LAT)
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, jnp.complex64)
    ueo = pack_gauge_eo(u, LAT)
    psis = rng.normal_spinor(
        jax.random.key(1), (R, 4, 3) + LAT.eo_site_shape, jnp.complex64
    )
    return ph, u, ueo, psis


@pytest.mark.parametrize("tb", ["1", "2", "4"])
def test_multirhs_matches_per_rhs(tb, monkeypatch):
    """Multi-RHS hopping (all tb variants, compressed gauge + fused mhat
    epilogue) == per-RHS single applications."""
    monkeypatch.setenv("TMLQCD_TPU_TB", tb)
    ph, u, ueo, psis = _setup()
    ug = dp.gauge_copy(ueo, LAT, ph)
    uge = dp.split_c(ug[EVEN]).astype(jnp.float32)
    ugec = dp.compress_ug(uge)
    gc = dp.gauge_corr(ph)
    psis2 = wf.to_split_rhs(psis)

    out = dp.hopping_pallas_split(uge, psis2, EVEN, LAT, interpret=True)
    for r in range(R):
        one = dp.hopping_pallas_split(uge, psis2[:, :, :, r], EVEN, LAT, interpret=True)
        assert float(jnp.max(jnp.abs(out[:, :, :, r] - one))) < 1e-6

    epi = ("mhat", float(PARAMS.mutld), 1.0, float(PARAMS.kappa**2), True)
    out = dp.hopping_pallas_split(
        ugec, psis2, EVEN, LAT, interpret=True, gcomp=gc, epi=epi, psi_o=psis2
    )
    for r in range(R):
        one = dp.hopping_pallas_split(
            ugec, psis2[:, :, :, r], EVEN, LAT, interpret=True, gcomp=gc,
            epi=epi, psi_o=psis2[:, :, :, r],
        )
        assert float(jnp.max(jnp.abs(out[:, :, :, r] - one))) < 1e-5


def test_multirhs_operator_matches_jnp():
    """q_hat_pm_fast on a 7-dim multi-RHS batch == jnp q_hat_pm per column."""
    ph, u, ueo, psis = _setup()
    fg = wf.make_fast_gauge(u, PARAMS, LAT)
    out = wf.from_split_rhs(wf.q_hat_pm_fast(fg, wf.to_split_rhs(psis), PARAMS, LAT))
    for r in range(R):
        ref = w.q_hat_pm(ueo, psis[r], PARAMS, LAT, ph)
        assert float(jnp.max(jnp.abs(out[r] - ref))) < 2e-4


def test_cg_rhs_matches_cg():
    """Batched cg_rhs == independent cg solves, per-side stopping."""
    from tmlqcd_tpu.solvers.cg import cg, cg_rhs

    ph, u, ueo, psis = _setup()
    fg = wf.make_fast_gauge(u, PARAMS, LAT)
    mv = lambda x2: wf.q_hat_pm_fast(fg, x2, PARAMS, LAT)
    b2 = wf.to_split_rhs(psis)
    res = cg_rhs(mv, b2, rhs_axis=3, tol=1e-6, maxiter=600)
    assert res.residual_sq.shape == (R,)
    for r in range(R):
        one = cg(mv, b2[:, :, :, r], tol=1e-6, maxiter=600)
        rel = float(
            jnp.linalg.norm(res.x[:, :, :, r] - one.x) / jnp.linalg.norm(one.x)
        )
        assert rel < 1e-4, (r, rel)


def test_invert_eo_rhs_matches_single():
    """Batched propagator inversion == per-source invert_eo (both clover
    branches), true residual checked on the full operator."""
    from tmlqcd_tpu.inverter import invert_eo, invert_eo_rhs

    u = su3.random_su3(jax.random.key(7), (4,) + LAT.site_shape, jnp.complex64)
    bs = rng.normal_spinor(jax.random.key(8), (2, 4, 3) + LAT.site_shape, jnp.complex64)
    res = invert_eo_rhs(u, bs, PARAMS, LAT, tol=1e-7, maxiter=800)
    for r in range(2):
        one = invert_eo(u, bs[r], PARAMS, LAT, tol=1e-7, maxiter=800, solver="fastcg")
        rel = float(jnp.linalg.norm(res.x[r] - one.x) / jnp.linalg.norm(one.x))
        assert rel < 1e-4, (r, rel)


def test_invert_eo_rhs_clover():
    """Clover branch of the batched inversion: M x = b verified directly via
    the full clover operator."""
    from tmlqcd_tpu.inverter import invert_clover_eo, invert_eo_rhs

    params = w.DiracParams(kappa=0.14, mu=0.03, c_sw=1.1)
    u = su3.random_su3(jax.random.key(9), (4,) + LAT.site_shape, jnp.complex64)
    bs = rng.normal_spinor(jax.random.key(10), (2, 4, 3) + LAT.site_shape, jnp.complex64)
    res = invert_eo_rhs(u, bs, params, LAT, tol=1e-7, maxiter=800)
    one = invert_clover_eo(u, bs[0], params, LAT, tol=1e-7, maxiter=800)
    rel = float(jnp.linalg.norm(res.x[0] - one.x) / jnp.linalg.norm(one.x))
    assert rel < 1e-4, rel


def test_invert_eo_rhs_sharded_mesh():
    """Batched propagator inversion under an ACTIVE domain-decomposition
    mesh (round 5): the 12-column odd solve rides the multi-RHS SHARDED
    kernel (R axis through hopping_pallas_shard's builds + batched halo
    ppermutes) and matches the unsharded batched result (reference: invert
    under the MPI decomposition)."""
    import numpy as np
    from jax.sharding import Mesh

    from tmlqcd_tpu import parallel
    from tmlqcd_tpu.inverter import invert_eo_rhs

    u = su3.random_su3(jax.random.key(11), (4,) + LAT.site_shape, jnp.complex64)
    bs = rng.normal_spinor(jax.random.key(12), (2, 4, 3) + LAT.site_shape, jnp.complex64)
    ref = invert_eo_rhs(u, bs, PARAMS, LAT, tol=1e-7, maxiter=800)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("t", "m"))
    with parallel.use_mesh(mesh):
        res = invert_eo_rhs(u, bs, PARAMS, LAT, tol=1e-7, maxiter=800)
    rel = float(jnp.linalg.norm(res.x - ref.x) / jnp.linalg.norm(ref.x))
    assert rel < 1e-4, rel
