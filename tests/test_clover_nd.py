"""Clover non-degenerate doublet tests (reference: Qsw_pm_ndpsi,
sw_invert_nd, clovernd_trlog_monomial.c)."""

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import Lattice, eo_pack, pack_gauge_eo
from tmlqcd_tpu.ops import clover as cl
from tmlqcd_tpu.ops import ndoublet as nd
from tmlqcd_tpu.ops.wilson import boundary_phases

LAT = Lattice((4, 4, 4, 4))
PARAMS = nd.NDParams(kappa=0.15, mubar=0.12, epsbar=0.05, c_sw=1.1)


def _fields(dt=jnp.complex128):
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, dt)
    chi = rng.normal_spinor(jax.random.key(1), (2, 4, 3) + LAT.eo_site_shape, dt)
    return u, chi


def test_mee_nd_clover_inverse():
    u, chi = _fields()
    sw_e, _ = cl.sw_blocks_eo(u, PARAMS.kappa, PARAMS.c_sw, LAT)
    for sign in (+1.0, -1.0):
        out = cl.mee_inv_nd_clover(
            sw_e,
            cl.mee_nd_clover(sw_e, chi, PARAMS.mubar_t, PARAMS.epsbar_t, sign),
            PARAMS.mubar_t,
            PARAMS.epsbar_t,
            sign,
        )
        assert float(jnp.max(jnp.abs(out - chi))) < 1e-12


def test_q_nd_clover_hermitian():
    u, chi = _fields()
    c2 = rng.normal_spinor(jax.random.key(2), chi.shape, chi.dtype)
    ueo = pack_gauge_eo(u, LAT)
    ph = boundary_phases(PARAMS.wilson, LAT)
    sw_e, sw_o = cl.sw_blocks_eo(u, PARAMS.kappa, PARAMS.c_sw, LAT)
    q = lambda x: cl.q_nd_clover(ueo, sw_e, sw_o, x, PARAMS, LAT, ph)
    lhs = jnp.vdot(chi, q(c2))
    rhs = jnp.vdot(q(chi), c2)
    assert abs(complex(lhs - rhs)) / abs(complex(lhs)) < 1e-12


def test_q_nd_clover_reduces_to_plain_at_csw_zero():
    u, chi = _fields()
    p0 = nd.NDParams(kappa=0.15, mubar=0.12, epsbar=0.05, c_sw=0.0)
    ueo = pack_gauge_eo(u, LAT)
    ph = boundary_phases(p0.wilson, LAT)
    # c_sw = 0 -> T = 0 -> clover path must equal the plain nd operator
    sw_e, sw_o = cl.sw_blocks_eo(u, p0.kappa, 0.0, LAT)
    out_c = cl.q_nd_clover(ueo, sw_e, sw_o, chi, p0, LAT, ph)
    out_p = nd.q_nd(ueo, chi, p0, LAT, ph)
    assert float(jnp.max(jnp.abs(out_c - out_p))) < 1e-12


def test_sw_logdet_nd_free_field():
    """T = 0: det M_ee^nd per site = (1 + mu^2 - eps^2)^12 (two chiralities
    x 6x6 blocks)."""
    u = jnp.broadcast_to(
        jnp.eye(3, dtype=jnp.complex128).reshape(3, 3, 1, 1, 1, 1),
        (3, 3, 4) + LAT.site_shape,
    )
    sw_e, _ = cl.sw_blocks_eo(u, PARAMS.kappa, PARAMS.c_sw, LAT)
    ld = float(cl.sw_logdet_nd(sw_e, PARAMS.mubar_t, PARAMS.epsbar_t))
    sh = PARAMS.mubar_t**2 - PARAMS.epsbar_t**2
    expect = (LAT.volume // 2) * 12 * np.log(1.0 + sh)
    assert abs(ld - expect) / abs(expect) < 1e-10


def test_q_nd_clover_fast_matches_jnp():
    """Split/Pallas clover-ND operator (materialized flavor-2x2 block
    inverses, sw_invert_nd analog) == jnp q_nd_clover."""
    from tmlqcd_tpu.ops import dslash_pallas as dpl
    from tmlqcd_tpu.ops import wilson_fast as wf

    u, chi = _fields(jnp.complex64)
    ueo = pack_gauge_eo(u, LAT)
    ph = boundary_phases(PARAMS.wilson, LAT)
    sw_e, sw_o = cl.sw_blocks_eo(u, PARAMS.kappa, PARAMS.c_sw, LAT)
    ref = cl.q_nd_clover(ueo, sw_e, sw_o, chi, PARAMS, LAT, ph)
    fc = wf.make_fast_clover_nd(u, PARAMS, LAT)
    out = dpl.merge_c(wf.q_nd_clover_fast(fc, wf.to_split(chi), PARAMS, LAT), chi.dtype)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-4


def test_ndrat_clover_fast_solve_matches_jnp(monkeypatch):
    """NDRAT acceptance action with clover: the fast multishift route
    (q_nd_sq_clover_fast) == the jnp route."""
    from tmlqcd_tpu.hmc.rational_monomials import NDRatMonomial

    u, _ = _fields(jnp.complex64)
    mono = NDRatMonomial(
        lat=LAT, params=PARAMS, order=6, s_min=5e-3, s_max=6.0,
        acc_tol=1e-7, maxiter=1500,
    )
    phi, _ = mono.heatbath(u, jax.random.key(9))
    monkeypatch.delenv("TMLQCD_TPU_FAST_SOLVES", raising=False)
    s_jnp = float(mono.action(u, phi))
    monkeypatch.setenv("TMLQCD_TPU_FAST_SOLVES", "1")
    s_fast = float(mono.action(u, phi))
    assert abs(s_fast - s_jnp) / abs(s_jnp) < 1e-4, (s_fast, s_jnp)


def test_ndrat_clover_fast_force_matches_jnp(monkeypatch):
    """NDCLOVERRAT MD force: the kernel-VJP hybrid surrogate (hoppings on
    the Pallas custom VJP, clover blocks via jnp AD — q_nd_clover_diff) ==
    full jnp AD of the clover-ND operator."""
    from tmlqcd_tpu.hmc.rational_monomials import NDRatMonomial

    u, _ = _fields(jnp.complex64)
    mono = NDRatMonomial(
        lat=LAT, params=PARAMS, order=4, s_min=5e-3, s_max=6.0,
        acc_tol=1e-7, force_tol=1e-7, maxiter=1500,
    )
    phi, _ = mono.heatbath(u, jax.random.key(11))
    monkeypatch.delenv("TMLQCD_TPU_FAST_SOLVES", raising=False)
    f_jnp = mono.force(u, phi)
    monkeypatch.setenv("TMLQCD_TPU_FAST_SOLVES", "1")
    f_fast = mono.force(u, phi)
    scale = float(jnp.max(jnp.abs(f_jnp)))
    err = float(jnp.max(jnp.abs(f_fast - f_jnp))) / scale
    assert err < 2e-3, (err, scale)
