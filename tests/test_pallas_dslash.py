"""Pallas dslash kernel vs the jnp reference implementation (interpret mode
on CPU — the kernel itself is validated on real TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import EVEN, ODD, Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import dslash_pallas as dp
from tmlqcd_tpu.ops import wilson as w


@pytest.mark.parametrize("dims", [(4, 4, 4, 4), (8, 4, 4, 6), (4, 4, 8, 64)])
def test_pallas_matches_reference(dims):
    lat = Lattice(dims)
    params = w.DiracParams(kappa=0.15, mu=0.01)
    ph = w.boundary_phases(params, lat)
    u = su3.random_su3(jax.random.key(0), (4,) + lat.site_shape, jnp.complex64)
    ueo = pack_gauge_eo(u, lat)
    psi = rng.normal_spinor(jax.random.key(1), (4, 3) + lat.eo_site_shape, jnp.complex64)
    ug = dp.gauge_copy(ueo, lat, ph)
    for p in (EVEN, ODD):
        ref = w.dslash_packed(ueo, psi, p, lat, ph)
        out = dp.hopping_pallas(ug, psi, p, lat, interpret=True)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_fast_operator_matches_reference():
    """Split-complex Qhat_pm (pallas kernel, auto-interpret off-TPU) ==
    complex Qhat_pm."""
    import tmlqcd_tpu.ops.wilson_fast as wf

    lat = Lattice((4, 4, 4, 4))
    params = w.DiracParams(kappa=0.13, mu=0.05)
    ph = w.boundary_phases(params, lat)
    u = su3.random_su3(jax.random.key(2), (4,) + lat.site_shape, jnp.complex64)
    ueo = pack_gauge_eo(u, lat)
    psi = rng.normal_spinor(jax.random.key(3), (4, 3) + lat.eo_site_shape, jnp.complex64)
    ref = w.q_hat_pm(ueo, psi, params, lat, ph)
    fg = wf.make_fast_gauge(u, params, lat)
    out = wf.from_split(wf.q_hat_pm_fast(fg, wf.to_split(psi), params, lat))
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-4


def test_fastcg_inverter_matches_reference():
    """invert_eo(solver='fastcg') == invert_eo(solver='cg')."""
    from tmlqcd_tpu.inverter import invert_eo

    lat = Lattice((4, 4, 4, 4))
    params = w.DiracParams(kappa=0.13, mu=0.05)
    u = su3.random_su3(jax.random.key(4), (4,) + lat.site_shape, jnp.complex64)
    b = rng.normal_spinor(jax.random.key(5), (4, 3) + lat.site_shape, jnp.complex64)
    x_ref = invert_eo(u, b, params, lat, tol=1e-7, maxiter=2000, solver="cg").x
    x_fast = invert_eo(u, b, params, lat, tol=1e-7, maxiter=2000, solver="fastcg").x
    rel = float(jnp.linalg.norm(x_fast - x_ref) / jnp.linalg.norm(x_ref))
    assert rel < 1e-4, rel


def test_gauge_copy_structure():
    """gauge_copy entries: fwd = ka*U on p; bwd = conj(ka)*U(x-mu)^+."""
    lat = Lattice((4, 4, 4, 4))
    params = w.DiracParams(kappa=0.15, mu=0.0)
    ph = w.boundary_phases(params, lat)
    u = su3.random_su3(jax.random.key(5), (4,) + lat.site_shape, jnp.complex64)
    ueo = pack_gauge_eo(u, lat)
    ug = dp.gauge_copy(ueo, lat, ph)
    assert ug.shape == (2, 8, 3, 3) + lat.eo_site_shape
    # forward t-link on even sites is ka_0 * U_0(even)
    np.testing.assert_allclose(
        np.asarray(ug[0, 0]),
        np.asarray(ph[0] * ueo[0, :, :, 0]).astype(np.complex64),
        atol=1e-6,
    )


def test_sloppy_bf16_gauge_close_to_f32():
    """bf16 gauge copy (mixed-precision inner-solve mode): same operator to
    ~bf16 accuracy (reference: the _32 sloppy gauge copies)."""
    import tmlqcd_tpu.ops.wilson_fast as wf

    lat = Lattice((4, 4, 4, 4))
    params = w.DiracParams(kappa=0.13, mu=0.05)
    u = su3.random_su3(jax.random.key(6), (4,) + lat.site_shape, jnp.complex64)
    psi = rng.normal_spinor(jax.random.key(7), (4, 3) + lat.eo_site_shape, jnp.complex64)
    fg32 = wf.make_fast_gauge(u, params, lat)
    fg16 = wf.make_fast_gauge(u, params, lat, sloppy=True)
    assert fg16.ug_even.dtype == jnp.bfloat16
    a = wf.q_hat_pm_fast(fg32, wf.to_split(psi), params, lat)
    b = wf.q_hat_pm_fast(fg16, wf.to_split(psi), params, lat)
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    assert rel < 0.05, rel  # bf16 has ~3 decimal digits


def test_compressed_gauge_matches_plain():
    """12-real compressed gauge copy (row 2 reconstructed in-kernel with the
    gauge_corr phase constants) == full 18-real copy to f32 rounding — with
    nontrivial theta BCs so the phase correction itself is exercised."""
    import tmlqcd_tpu.ops.wilson_fast as wf

    lat = Lattice((4, 4, 4, 4))
    params = w.DiracParams(kappa=0.13, mu=0.05, theta=(1.0, 0.3, 0.0, -0.7))
    u = su3.random_su3(jax.random.key(6), (4,) + lat.site_shape, jnp.complex64)
    psi = rng.normal_spinor(jax.random.key(7), (4, 3) + lat.eo_site_shape, jnp.complex64)
    fg = wf.make_fast_gauge(u, params, lat, compress=False)
    fgc = wf.make_fast_gauge(u, params, lat, compress=True)
    assert fg.ug_even.shape[2] == 3 and fgc.ug_even.shape[2] == 2
    assert fgc.gcomp is not None
    a = wf.q_hat_pm_fast(fg, wf.to_split(psi), params, lat)
    b = wf.q_hat_pm_fast(fgc, wf.to_split(psi), params, lat)
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    assert rel < 1e-5, rel


def test_fastmixed_inverter_matches_reference():
    """invert_eo(solver='fastmixed'): bf16-gauge inner CG + f32 defect
    correction reaches the same solution."""
    from tmlqcd_tpu.inverter import invert_eo

    lat = Lattice((4, 4, 4, 4))
    params = w.DiracParams(kappa=0.13, mu=0.05)
    u = su3.random_su3(jax.random.key(8), (4,) + lat.site_shape, jnp.complex64)
    b = rng.normal_spinor(jax.random.key(9), (4, 3) + lat.site_shape, jnp.complex64)
    x_ref = invert_eo(u, b, params, lat, tol=1e-7, maxiter=2000, solver="cg").x
    x_mix = invert_eo(u, b, params, lat, tol=1e-7, maxiter=2000, solver="fastmixed").x
    rel = float(jnp.linalg.norm(x_mix - x_ref) / jnp.linalg.norm(x_ref))
    assert rel < 1e-4, rel


def test_q_nd_fast_matches_reference():
    """Split-path Q_nd (pallas, interpret off-TPU) == complex Q_nd."""
    import numpy as np

    import tmlqcd_tpu.ops.wilson_fast as wf
    from tmlqcd_tpu.ops import ndoublet as nd

    lat = Lattice((4, 4, 4, 4))
    params = nd.NDParams(kappa=0.15, mubar=0.12, epsbar=0.05)
    u = su3.random_su3(jax.random.key(10), (4,) + lat.site_shape, jnp.complex64)
    chi = rng.normal_spinor(jax.random.key(11), (2, 4, 3) + lat.eo_site_shape, jnp.complex64)
    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params.wilson, lat)
    ref = nd.q_nd(ueo, chi, params, lat, ph)

    fg = wf.make_fast_gauge(u, params.wilson, lat)
    chi2 = jnp.stack([chi.real, chi.imag]).astype(jnp.float32)
    out2 = wf.q_nd_fast(fg, chi2, params, lat)
    out = jax.lax.complex(out2[0], out2[1])
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-4


def test_ndrat_fast_multishift_matches_reference():
    """NDRatMonomial action with TMLQCD_TPU_FAST_SOLVES=1 (interpret pallas)
    equals the jnp path."""
    import os

    from tmlqcd_tpu.hmc.rational_monomials import NDRatMonomial
    from tmlqcd_tpu.ops import ndoublet as nd

    lat = Lattice((4, 4, 4, 4))
    params = nd.NDParams(kappa=0.15, mubar=0.12, epsbar=0.05)
    mono = NDRatMonomial(lat=lat, params=params, order=6, s_min=5e-3, s_max=6.0,
                         acc_tol=1e-8, maxiter=1500)
    u = su3.random_su3(jax.random.key(12), (4,) + lat.site_shape, jnp.complex64)
    phi = rng.normal_spinor(jax.random.key(13), (2, 4, 3) + lat.eo_site_shape, jnp.complex64)
    old = os.environ.get("TMLQCD_TPU_FAST_SOLVES")
    try:
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "0"
        s_ref = float(mono.action(u, phi))
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "1"
        s_fast = float(mono.action(u, phi))
    finally:
        if old is None:
            os.environ.pop("TMLQCD_TPU_FAST_SOLVES", None)
        else:
            os.environ["TMLQCD_TPU_FAST_SOLVES"] = old
    assert abs(s_fast - s_ref) / abs(s_ref) < 1e-4, (s_fast, s_ref)


def test_q_clover_fast_matches_reference():
    """Split-path Qsw_pm (materialized blocks + pallas hopping) == complex."""
    import tmlqcd_tpu.ops.wilson_fast as wf
    from tmlqcd_tpu.ops import clover as cl

    lat = Lattice((4, 4, 4, 4))
    params = w.DiracParams(kappa=0.14, mu=0.04, c_sw=1.3)
    u = su3.random_su3(jax.random.key(14), (4,) + lat.site_shape, jnp.complex64)
    psi = rng.normal_spinor(jax.random.key(15), (4, 3) + lat.eo_site_shape, jnp.complex64)
    ueo = pack_gauge_eo(u, lat)
    ph = w.boundary_phases(params, lat)
    sw_e, sw_o = cl.sw_blocks_eo(u, params.kappa, params.c_sw, lat)
    ref = cl.q_hat_pm_clover(ueo, sw_e, sw_o, psi, params, lat, ph)
    fc = wf.make_fast_clover(u, params, lat)
    out = wf.from_split(wf.q_hat_pm_clover_fast(fc, wf.to_split(psi), params, lat))
    assert float(jnp.max(jnp.abs(out - ref))) < 3e-4


def test_cloverdet_fast_solve_matches_reference():
    """CloverDetMonomial action with fast solves == jnp path."""
    import os

    from tmlqcd_tpu.hmc import CloverDetMonomial

    lat = Lattice((4, 4, 4, 4))
    mono = CloverDetMonomial(
        lat=lat, params=w.DiracParams(kappa=0.14, mu=0.02, c_sw=1.3),
        acc_tol=1e-8, force_tol=1e-8, maxiter=1500,
    )
    u = su3.random_su3(jax.random.key(16), (4,) + lat.site_shape, jnp.complex64)
    old = os.environ.get("TMLQCD_TPU_FAST_SOLVES")
    try:
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "0"
        phi, _ = mono.heatbath(u, jax.random.key(17))
        s_ref = float(mono.action(u, phi))
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "1"
        s_fast = float(mono.action(u, phi))
    finally:
        if old is None:
            os.environ.pop("TMLQCD_TPU_FAST_SOLVES", None)
        else:
            os.environ["TMLQCD_TPU_FAST_SOLVES"] = old
    assert abs(s_fast - s_ref) / abs(s_ref) < 1e-4, (s_fast, s_ref)


def test_hopping_diff_vjp_vs_finite_difference():
    """Custom-VJP hopping (force kernel): grads w.r.t. ug and psi match FD."""
    from tmlqcd_tpu.lattice import EVEN

    lat = Lattice((4, 4, 4, 4))
    params = w.DiracParams(kappa=0.15, mu=0.01)
    ph = w.boundary_phases(params, lat)
    u = su3.random_su3(jax.random.key(0), (4,) + lat.site_shape, jnp.complex64)
    ug = dp.gauge_copy(pack_gauge_eo(u, lat), lat, ph)
    ug0 = dp.split_c(ug[0]).astype(jnp.float32)
    ug1 = dp.split_c(ug[1]).astype(jnp.float32)
    psi = dp.split_c(
        rng.normal_spinor(jax.random.key(1), (4, 3) + lat.eo_site_shape, jnp.complex64)
    ).astype(jnp.float32)
    g = dp.split_c(
        rng.normal_spinor(jax.random.key(2), (4, 3) + lat.eo_site_shape, jnp.complex64)
    ).astype(jnp.float32)

    def s_fn(ug_p, psi_q):
        return jnp.sum(g * dp.hopping_diff(ug_p, ug1, psi_q, EVEN, lat, True))

    dug, dpsi = jax.grad(s_fn, argnums=(0, 1))(ug0, psi)
    import numpy as np

    r = np.random.default_rng(3)
    for arrs, grads, argn in ((ug0, dug, 0), (psi, dpsi, 1)):
        for _ in range(3):
            idx = tuple(r.integers(0, s) for s in arrs.shape)
            eps = 1e-2
            args = [ug0, psi]
            up = args[argn].at[idx].add(eps)
            dn = args[argn].at[idx].add(-eps)
            fd = (
                float(s_fn(*(up if i == argn else a for i, a in enumerate(args))))
                - float(s_fn(*(dn if i == argn else a for i, a in enumerate(args))))
            ) / (2 * eps)
            an = float(grads[idx])
            assert abs(fd - an) / max(abs(fd), 1e-6) < 3e-2, (argn, idx, fd, an)


def test_det_force_fast_matches_jnp():
    """DetMonomial force on the kernel-VJP path == jnp-AD path."""
    import os

    from tmlqcd_tpu.hmc import DetMonomial

    lat = Lattice((4, 4, 4, 4))
    mono = DetMonomial(
        lat=lat, params=w.DiracParams(kappa=0.14, mu=0.03),
        acc_tol=1e-9, force_tol=1e-9, maxiter=1500,
    )
    u = su3.random_su3(jax.random.key(20), (4,) + lat.site_shape, jnp.complex64)
    old = os.environ.get("TMLQCD_TPU_FAST_SOLVES")
    try:
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "0"
        phi, _ = mono.heatbath(u, jax.random.key(21))
        f_ref = mono.force(u, phi)
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "1"
        f_fast = mono.force(u, phi)
    finally:
        if old is None:
            os.environ.pop("TMLQCD_TPU_FAST_SOLVES", None)
        else:
            os.environ["TMLQCD_TPU_FAST_SOLVES"] = old
    rel = float(jnp.linalg.norm(f_fast - f_ref) / jnp.linalg.norm(f_ref))
    assert rel < 1e-4, rel


def test_detratio_force_fast_matches_jnp():
    import os

    from tmlqcd_tpu.hmc import DetRatioMonomial

    lat = Lattice((4, 4, 4, 4))
    mono = DetRatioMonomial(
        lat=lat,
        params1=w.DiracParams(kappa=0.14, mu=0.01),
        params2=w.DiracParams(kappa=0.14, mu=0.08),
        acc_tol=1e-9, force_tol=1e-9, maxiter=1500,
    )
    u = su3.random_su3(jax.random.key(22), (4,) + lat.site_shape, jnp.complex64)
    old = os.environ.get("TMLQCD_TPU_FAST_SOLVES")
    try:
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "0"
        phi, _ = mono.heatbath(u, jax.random.key(23))
        f_ref = mono.force(u, phi)
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "1"
        f_fast = mono.force(u, phi)
    finally:
        if old is None:
            os.environ.pop("TMLQCD_TPU_FAST_SOLVES", None)
        else:
            os.environ["TMLQCD_TPU_FAST_SOLVES"] = old
    rel = float(jnp.linalg.norm(f_fast - f_ref) / jnp.linalg.norm(f_ref))
    assert rel < 1e-4, rel


def test_ndrat_force_fast_matches_jnp():
    """NDRAT force on the kernel-VJP path == jnp-AD path."""
    import os

    from tmlqcd_tpu.hmc.rational_monomials import NDRatMonomial
    from tmlqcd_tpu.ops import ndoublet as nd

    lat = Lattice((4, 4, 4, 4))
    mono = NDRatMonomial(
        lat=lat, params=nd.NDParams(kappa=0.15, mubar=0.12, epsbar=0.05),
        order=6, s_min=5e-3, s_max=6.0, acc_tol=1e-9, force_tol=1e-9, maxiter=1500,
    )
    u = su3.random_su3(jax.random.key(30), (4,) + lat.site_shape, jnp.complex64)
    old = os.environ.get("TMLQCD_TPU_FAST_SOLVES")
    try:
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "0"
        phi, _ = mono.heatbath(u, jax.random.key(31))
        f_ref = mono.force(u, phi)
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "1"
        f_fast = mono.force(u, phi)
    finally:
        if old is None:
            os.environ.pop("TMLQCD_TPU_FAST_SOLVES", None)
        else:
            os.environ["TMLQCD_TPU_FAST_SOLVES"] = old
    rel = float(jnp.linalg.norm(f_fast - f_ref) / jnp.linalg.norm(f_ref))
    assert rel < 2e-4, rel


def test_cloverdet_force_fast_matches_jnp():
    """CloverDet force: kernel-VJP hoppings + jnp clover-block AD == full
    jnp-AD force."""
    import os

    from tmlqcd_tpu.hmc import CloverDetMonomial

    lat = Lattice((4, 4, 4, 4))
    mono = CloverDetMonomial(
        lat=lat, params=w.DiracParams(kappa=0.14, mu=0.02, c_sw=1.3),
        acc_tol=1e-9, force_tol=1e-9, maxiter=1500,
    )
    u = su3.random_su3(jax.random.key(40), (4,) + lat.site_shape, jnp.complex64)
    old = os.environ.get("TMLQCD_TPU_FAST_SOLVES")
    try:
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "0"
        phi, _ = mono.heatbath(u, jax.random.key(41))
        f_ref = mono.force(u, phi)
        os.environ["TMLQCD_TPU_FAST_SOLVES"] = "1"
        f_fast = mono.force(u, phi)
    finally:
        if old is None:
            os.environ.pop("TMLQCD_TPU_FAST_SOLVES", None)
        else:
            os.environ["TMLQCD_TPU_FAST_SOLVES"] = old
    rel = float(jnp.linalg.norm(f_fast - f_ref) / jnp.linalg.norm(f_ref))
    assert rel < 2e-4, rel
