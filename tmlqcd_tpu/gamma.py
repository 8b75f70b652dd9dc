"""Dirac gamma matrices (tmLQCD chiral basis) and spin-projector factorizations.

Reference: tmLQCD's gamma conventions (documented in the tmLQCD paper,
arXiv:0905.3331, and encoded in su3spinor.h spin-projection macros
`_vector_add`, halfspinor_hopping.h).  gamma5 is diagonal (+,+,-,-).

The hopping matrix needs (1 -/+ gamma_mu), each a rank-2 multiple of a
projector: (1 -/+ gamma_mu) = 2 V V^+ with V a 4x2 isometry.  The reference
hand-codes the corresponding 2-spinor "halfspinor" algebra per direction; here
the V factors are computed *numerically* once at import (eigendecomposition of
the projector), which gives the same optimal flop count (~1320 flops/site for
the dslash) generically and provably correctly for any basis.
"""

from __future__ import annotations

import numpy as np

__all__ = ["GAMMA", "GAMMA5", "V_MINUS", "V_PLUS", "SIGMA_MUNU", "apply_gamma5"]

_i = 1j

# gamma_0 (time), gamma_1, gamma_2, gamma_3 — tmLQCD basis, hermitian,
# {gamma_mu, gamma_nu} = 2 delta_munu, gamma5 = gamma0 gamma1 gamma2 gamma3.
GAMMA = np.array(
    [
        [
            [0, 0, -1, 0],
            [0, 0, 0, -1],
            [-1, 0, 0, 0],
            [0, -1, 0, 0],
        ],
        [
            [0, 0, 0, -_i],
            [0, 0, -_i, 0],
            [0, _i, 0, 0],
            [_i, 0, 0, 0],
        ],
        [
            [0, 0, 0, -1],
            [0, 0, 1, 0],
            [0, 1, 0, 0],
            [-1, 0, 0, 0],
        ],
        [
            [0, 0, -_i, 0],
            [0, 0, 0, _i],
            [_i, 0, 0, 0],
            [0, -_i, 0, 0],
        ],
    ],
    dtype=np.complex128,
)

GAMMA5 = GAMMA[0] @ GAMMA[1] @ GAMMA[2] @ GAMMA[3]


def _projector_isometry(p: np.ndarray) -> np.ndarray:
    """4x2 isometry V with p = V V^+ for a rank-2 hermitian projector."""
    w, v = np.linalg.eigh(p)
    cols = np.argsort(w)[-2:]
    iso = v[:, cols]
    # Sanity: exact projector reconstruction.
    assert np.allclose(iso @ iso.conj().T, p, atol=1e-12)
    return iso


# (1 - gamma_mu) = 2 V_MINUS[mu] V_MINUS[mu]^+   (forward hop projector)
# (1 + gamma_mu) = 2 V_PLUS[mu]  V_PLUS[mu]^+    (backward hop projector)
V_MINUS = np.stack([_projector_isometry(0.5 * (np.eye(4) - GAMMA[mu])) for mu in range(4)])
V_PLUS = np.stack([_projector_isometry(0.5 * (np.eye(4) + GAMMA[mu])) for mu in range(4)])

# sigma_munu = (i/2) [gamma_mu, gamma_nu] — for the clover term.
SIGMA_MUNU = np.zeros((4, 4, 4, 4), dtype=np.complex128)
for _mu in range(4):
    for _nu in range(4):
        SIGMA_MUNU[_mu, _nu] = 0.5j * (
            GAMMA[_mu] @ GAMMA[_nu] - GAMMA[_nu] @ GAMMA[_mu]
        )


def apply_gamma5(psi):
    """gamma5 psi for spinor fields [4 spin, 3 color, *sites] — diagonal
    (+,+,-,-): a broadcast sign flip on the leading spin axis (no matmul)."""
    import jax.numpy as jnp

    sign = jnp.asarray([1.0, 1.0, -1.0, -1.0], psi.real.dtype).reshape(
        (4,) + (1,) * (psi.ndim - 1)
    )
    return psi * sign
