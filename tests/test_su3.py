"""SU(3)/su(3) algebra unit tests (the reference's SIMD macro layer has no
unit tests — survey §4 flags that gap; we do not copy it).

Layout note: matrices are [3, 3, *batch] (color-leading SoA — see
tmlqcd_tpu.lattice docstring); scipy/numpy comparisons moveaxis to (*, 3, 3).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu import su3


def _to_np_batched(m):
    """[3,3,B] -> [B,3,3] numpy."""
    return np.moveaxis(np.asarray(m), (0, 1), (-2, -1))


def test_momenta_are_traceless_antihermitian():
    p = su3.random_momenta(jax.random.key(1), (64,))
    np.testing.assert_allclose(np.asarray(su3.adj(p)), -np.asarray(p), atol=1e-6)
    assert np.abs(np.asarray(su3.trace(p))).max() < 1e-5


def test_momenta_covariance():
    """<|H_ij|^2> = 1/3 (diag), 1/2 (offdiag) for H = sum p_a T_a, p_a~N(0,1)."""
    p = su3.random_momenta(jax.random.key(2), (20000,))
    c = np.mean(np.abs(_to_np_batched(p)) ** 2, axis=0)
    np.testing.assert_allclose(c.diagonal(), 1 / 3, atol=0.02)
    np.testing.assert_allclose(c[0, 1], 0.5, atol=0.02)


def test_kinetic_energy_normalization():
    """E = tr(H^2) has mean 4 per link (8 gaussian d.o.f. * 1/2)."""
    n = 20000
    p = su3.random_momenta(jax.random.key(3), (n,))
    e = float(su3.kinetic_energy(p)) / n
    assert abs(e - 4.0) < 0.06


def test_expm_matches_scipy():
    from scipy.linalg import expm as scipy_expm

    p = su3.random_momenta(jax.random.key(4), (8,), jnp.complex128)
    ref = np.stack([scipy_expm(m) for m in _to_np_batched(p)])
    got = _to_np_batched(su3.expm_ta(p))
    assert np.abs(got - ref).max() < 1e-12


def test_expm_lands_in_su3():
    p = su3.random_momenta(jax.random.key(5), (128,))
    u = su3.expm_ta(p)
    assert float(su3.unitarity_defect(u)) < 5e-6
    det = np.linalg.det(_to_np_batched(u).astype(np.complex128))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_project_su3():
    u = su3.expm_ta(su3.random_momenta(jax.random.key(6), (64,)))
    u_pert = u + 0.05 * su3.random_momenta(jax.random.key(7), (64,))
    pr = su3.project_su3(u_pert)
    assert float(su3.unitarity_defect(pr)) < 5e-6
    det = np.linalg.det(_to_np_batched(pr).astype(np.complex128))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_mul_matches_numpy():
    a = su3.random_su3(jax.random.key(8), (16,))
    b = su3.random_su3(jax.random.key(9), (16,))
    got = _to_np_batched(su3.mul(a, b))
    ref = _to_np_batched(a) @ _to_np_batched(b)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_ta_project():
    kr, ki = jax.random.split(jax.random.key(10))
    m = jax.lax.complex(
        jax.random.normal(kr, (3, 3, 16)), jax.random.normal(ki, (3, 3, 16))
    )
    t = su3.ta_project(m)
    np.testing.assert_allclose(np.asarray(su3.adj(t)), -np.asarray(t), atol=1e-6)
    assert np.abs(np.asarray(su3.trace(t))).max() < 1e-6
    np.testing.assert_allclose(np.asarray(su3.ta_project(t)), np.asarray(t), atol=1e-6)
