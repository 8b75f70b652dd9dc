"""Jacobi source smearing + APE link smearing (reference: jacobi.c, survey
2.9 Sources row): gauge covariance — the property that pins every index and
adjoint in the covariant-Laplacian and staple formulas — plus exact
free-field fixed points and SU(3)-closure of the APE projection."""

import jax
import jax.numpy as jnp
import pytest

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import Lattice, shift_full
from tmlqcd_tpu.meas.smearing import ape_smear_spatial, jacobi_smear
from tmlqcd_tpu.meas.sources import z2_timeslice_source
from tmlqcd_tpu.ops.gauge_action import plaquette

LAT = Lattice((4, 4, 4, 4))


def _random_gauge_rotation(key):
    """g(x) in SU(3) per site, plus its action on links and spinors."""
    g = su3.random_su3(key, LAT.site_shape, jnp.complex64)

    def on_links(u):
        cols = []
        for mu in range(4):
            gx = shift_full(g, mu, +1, LAT)
            cols.append(su3.mul(su3.mul(g, u[:, :, mu]), su3.adj(gx)))
        return jnp.stack(cols, axis=2)

    def on_spinor(psi):
        return jnp.stack([su3.matvec(g, psi[s]) for s in range(4)])

    return on_links, on_spinor


def test_jacobi_unit_links_constant_fixed_point():
    """With U=1 a spatially constant timeslice source is an exact eigenvector
    (eigenvalue 1) of the Jacobi sweep."""
    u = jnp.broadcast_to(
        jnp.eye(3, dtype=jnp.complex64).reshape(3, 3, 1, 1, 1, 1),
        (3, 3, 4) + LAT.site_shape,
    )
    src = jnp.zeros((4, 3) + LAT.site_shape, jnp.complex64)
    src = src.at[0, 0, 2].set(1.0)  # constant over the t=2 slice
    out = jacobi_smear(src, u, LAT, kappa=0.3, n_iter=6)
    assert float(jnp.max(jnp.abs(out - src))) < 1e-5


def test_jacobi_timeslice_support_preserved():
    """Spatial-only hops: a t=1 wall source stays on t=1."""
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, jnp.complex64)
    src = z2_timeslice_source(LAT, 1, jax.random.key(1))
    out = jacobi_smear(src, u, LAT, kappa=0.21, n_iter=4)
    mask = jnp.arange(LAT.dims[0]) != 1
    off = out[:, :, mask]
    assert float(jnp.max(jnp.abs(off))) == 0.0
    assert float(jnp.linalg.norm(out)) > 0.1  # and it did something


def test_jacobi_gauge_covariance():
    u = su3.random_su3(jax.random.key(2), (4,) + LAT.site_shape, jnp.complex64)
    psi = rng.normal_spinor(jax.random.key(3), (4, 3) + LAT.site_shape, jnp.complex64)
    on_links, on_spinor = _random_gauge_rotation(jax.random.key(4))
    a = on_spinor(jacobi_smear(psi, u, LAT, kappa=0.21, n_iter=3))
    b = jacobi_smear(on_spinor(psi), on_links(u), LAT, kappa=0.21, n_iter=3)
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    assert rel < 1e-5, rel


def test_ape_gauge_covariance_and_su3():
    u = su3.random_su3(jax.random.key(5), (4,) + LAT.site_shape, jnp.complex64)
    on_links, _ = _random_gauge_rotation(jax.random.key(6))
    a = on_links(ape_smear_spatial(u, LAT, alpha=0.5, n_iter=2))
    b = ape_smear_spatial(on_links(u), LAT, alpha=0.5, n_iter=2)
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    assert rel < 1e-5, rel
    assert float(su3.unitarity_defect(b)) < 1e-5


def test_ape_smooths_and_keeps_temporal_links():
    """On a warm config (exp of a scaled algebra element — a hot random one
    has no smooth structure to extract) APE raises the SPATIAL plaquette
    monotonically; temporal links pass through untouched."""
    h = su3.random_momenta(jax.random.key(7), (4,) + LAT.site_shape)
    u = su3.expm_ta(0.6 * h)

    def sp_plaq(uc):
        from tmlqcd_tpu.ops.gauge_action import plaquette_field

        vals = [
            float(jnp.mean(su3.re_trace(plaquette_field(uc, mu, nu, LAT))) / 3.0)
            for mu in range(1, 4)
            for nu in range(mu + 1, 4)
        ]
        return sum(vals) / len(vals)

    sm1 = ape_smear_spatial(u, LAT, alpha=0.5, n_iter=1)
    sm4 = ape_smear_spatial(u, LAT, alpha=0.5, n_iter=4)
    assert float(jnp.max(jnp.abs(sm4[:, :, 0] - u[:, :, 0]))) == 0.0
    p0, p1, p4 = sp_plaq(u), sp_plaq(sm1), sp_plaq(sm4)
    assert p1 > p0 + 0.05, (p0, p1)
    assert p4 > p1, (p1, p4)


@pytest.mark.parametrize("kappa", [0.15])
def test_jacobi_point_source_spreads(kappa):
    """A point source acquires support on spatial neighbors (radius grows)."""
    u = su3.random_su3(jax.random.key(8), (4,) + LAT.site_shape, jnp.complex64)
    from tmlqcd_tpu.meas.sources import point_source

    src = point_source(LAT, 0, 0, (0, 0, 0, 0))
    out = jacobi_smear(src, u, LAT, kappa=kappa, n_iter=3)
    # neighbor (0, 1, 0, 0) populated, origin still dominant
    m0 = float(jnp.abs(out[0, :, 0, 1, 0]).max())
    assert m0 > 1e-4
    assert float(jnp.abs(out[:, :, 0, 0, 0]).max()) > m0


def test_invert_cli_smeared_z2_source(tmp_path):
    """End-to-end: the invert driver reads SourceType/smearing keys from the
    input file, smears the stochastic wall source on APE links, solves, and
    writes a propagator (reference: invert.c main + source_generation.c +
    jacobi.c wiring)."""
    import numpy as np

    from tmlqcd_tpu.cli.invert import main as invert_main
    from tmlqcd_tpu.io.checkpoint import save_checkpoint

    u = su3.random_su3(jax.random.key(3), (4,) + LAT.site_shape, jnp.complex64)
    conf = save_checkpoint(str(tmp_path), u, 7, seed=11, lat=LAT)
    inp = tmp_path / "invert.input"
    inp.write_text(
        "T = 4\nLX = 4\nLY = 4\nLZ = 4\n"
        "SourceType = Timeslice\nSourceTimeslice = 1\n"
        "UseSourceSmearing = 1\nJacobiKappa = 0.2\nJacobiIterations = 2\n"
        "APEAlpha = 0.4\nAPEIterations = 1\n"
        "BeginOperator TMWILSON\n"
        "  kappa = 0.15\n  2KappaMu = 0.03\n  Solver = cg\n"
        "  SolverPrecision = 1e-14\n  MaxSolverIterations = 300\n"
        "EndOperator\n"
    )
    rc = invert_main(["-f", str(inp), "-c", conf, "--format", "npz",
                      "-o", str(tmp_path)])
    assert rc == 0
    out = list(tmp_path.glob("propagator.*.npz"))
    assert len(out) == 1
    prop = np.load(out[0])["propagator"]
    assert prop.shape[0] == 1  # one stochastic source
    assert np.isfinite(prop).all() and np.linalg.norm(prop) > 0


# ---------------------------------------------------------------------------
# stout smearing (reference: stout_smear.c, UseStoutSmearing/StoutRho keys)


def test_stout_su3_and_gauge_covariance():
    """The analytic exp(TA(.)) update stays in SU(3) exactly (no projection
    step) and commutes with gauge rotations — pins every adjoint in Omega."""
    from tmlqcd_tpu.meas.smearing import stout_smear

    u = su3.random_su3(jax.random.key(10), (4,) + LAT.site_shape, jnp.complex64)
    on_links, _ = _random_gauge_rotation(jax.random.key(11))
    a = on_links(stout_smear(u, LAT, rho=0.12, n_iter=2))
    b = stout_smear(on_links(u), LAT, rho=0.12, n_iter=2)
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    assert rel < 1e-5, rel
    assert float(su3.unitarity_defect(b)) < 1e-5


def test_stout_rho0_identity_and_smooths():
    """rho=0 is exactly the identity map; rho>0 raises the plaquette on a
    warm config (the smoothing the smearing exists for)."""
    from tmlqcd_tpu.meas.smearing import stout_smear

    h = su3.random_momenta(jax.random.key(12), (4,) + LAT.site_shape)
    u = su3.expm_ta(0.6 * h)
    assert float(jnp.max(jnp.abs(stout_smear(u, LAT, rho=0.0, n_iter=2) - u))) < 1e-6
    p0 = float(plaquette(u, LAT))
    p1 = float(plaquette(stout_smear(u, LAT, rho=0.1, n_iter=1), LAT))
    p3 = float(plaquette(stout_smear(u, LAT, rho=0.1, n_iter=3), LAT))
    assert p1 > p0 + 0.05, (p0, p1)
    assert p3 > p1, (p1, p3)


def test_stout_spatial_only_keeps_temporal():
    from tmlqcd_tpu.meas.smearing import stout_smear

    u = su3.random_su3(jax.random.key(13), (4,) + LAT.site_shape, jnp.complex64)
    sm = stout_smear(u, LAT, rho=0.15, n_iter=2, spatial_only=True)
    assert float(jnp.max(jnp.abs(sm[:, :, 0] - u[:, :, 0]))) == 0.0
    assert float(jnp.max(jnp.abs(sm[:, :, 1] - u[:, :, 1]))) > 1e-3


def test_stout_differentiable_vs_fd():
    """jax.grad through the smearing (the reference's hand-derived
    stout_force chain rule): directional derivative of plaquette(stout(U))
    against central finite differences."""
    from tmlqcd_tpu.meas.smearing import stout_smear

    lat = Lattice((2, 2, 2, 2))
    u = su3.random_su3(jax.random.key(14), (4,) + lat.site_shape, jnp.complex64)
    h = su3.random_momenta(jax.random.key(15), (4,) + lat.site_shape)

    def f(eps):
        ue = su3.mul(su3.expm_ta(eps * h), u)
        return jnp.sum(plaquette(stout_smear(ue, lat, rho=0.1, n_iter=2), lat))

    g = float(jax.grad(lambda e: f(e))(jnp.asarray(0.0, jnp.float32)))
    eps = 1e-2
    fd = float((f(jnp.asarray(eps)) - f(jnp.asarray(-eps))) / (2 * eps))
    assert abs(g - fd) < 5e-3 * max(1.0, abs(fd)), (g, fd)
