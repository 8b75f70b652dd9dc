"""Gamma matrix algebra and projector factorization tests."""

import numpy as np

from tmlqcd_tpu.gamma import GAMMA, GAMMA5, SIGMA_MUNU, V_MINUS, V_PLUS


def test_clifford_algebra():
    for mu in range(4):
        for nu in range(4):
            ac = GAMMA[mu] @ GAMMA[nu] + GAMMA[nu] @ GAMMA[mu]
            np.testing.assert_allclose(ac, 2 * (mu == nu) * np.eye(4), atol=1e-14)


def test_hermiticity():
    for mu in range(4):
        np.testing.assert_allclose(GAMMA[mu].conj().T, GAMMA[mu], atol=1e-14)


def test_gamma5_diagonal():
    np.testing.assert_allclose(GAMMA5, np.diag([1, 1, -1, -1]), atol=1e-14)


def test_projector_factorization():
    for mu in range(4):
        np.testing.assert_allclose(
            2 * V_MINUS[mu] @ V_MINUS[mu].conj().T, np.eye(4) - GAMMA[mu], atol=1e-12
        )
        np.testing.assert_allclose(
            2 * V_PLUS[mu] @ V_PLUS[mu].conj().T, np.eye(4) + GAMMA[mu], atol=1e-12
        )


def test_sigma_antisymmetric_hermitian():
    for mu in range(4):
        for nu in range(4):
            np.testing.assert_allclose(SIGMA_MUNU[mu, nu], -SIGMA_MUNU[nu, mu], atol=1e-14)
            np.testing.assert_allclose(
                SIGMA_MUNU[mu, nu].conj().T, SIGMA_MUNU[mu, nu], atol=1e-14
            )
