"""Non-degenerate twisted-mass flavor doublet (strange/charm) operators.

Reference: operator/tm_operators_nd.c (`Qtm_pm_ndpsi`, `Qsw_pm_ndpsi`,
`mul_one_pm_itau2...` flavor-diagonal helpers), survey §2.5 "Non-degenerate
doublet" and Appendix A: the Nf=1+1 sector of an Nf=2+1+1 run, weighted by
det(Q_nd^2)^{1/2} via the rational (NDRAT) monomial.

Physics (2-kappa normalization, matching ops/wilson.py):

    D_h = (1 + i mubar_t gamma5 tau3 + epsbar_t tau1) - kappa H (x) 1_f

with mubar_t = 2 kappa mubar, epsbar_t = 2 kappa epsbar, H the hopping matrix
(flavor-diagonal), tau_i Pauli matrices in (up, down) = (strange', charm')
flavor space.  The doublet is gamma5*tau1-hermitian:

    (gamma5 tau1) D_h (gamma5 tau1) = D_h^+

so Q_nd = gamma5 tau1 Mhat_nd is HERMITIAN (not positive); the rational
monomial operates on Q_nd^2 = Q_nd^+ Q_nd > 0.

Even/odd Schur preconditioning: M_ee = 1 + i mubar_t gamma5 tau3 +
epsbar_t tau1 with closed-form inverse

    M_ee^{-1} = (1 - i mubar_t gamma5 tau3 - epsbar_t tau1)
                / (1 + mubar_t^2 - epsbar_t^2)

(requires 1 + mubar_t^2 > epsbar_t^2 — checked at config time; reference:
the same condition on mubar/epsbar in tm_operators_nd.c).

LAYOUT: doublet fields are [2 flavor, 4 spin, 3 color, T, X, M] — flavor is
one more tiny LEADING axis (site dims stay minor, see tmlqcd_tpu.lattice).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tmlqcd_tpu.gamma import apply_gamma5
from tmlqcd_tpu.lattice import EVEN, ODD, Lattice
from tmlqcd_tpu.ops.wilson import DiracParams, dslash_packed

__all__ = [
    "NDParams",
    "mee_nd",
    "mee_inv_nd",
    "m_hat_nd",
    "q_nd",
    "q_nd_sq",
    "tau1",
]


@dataclasses.dataclass(frozen=True)
class NDParams:
    """Static parameters of the non-degenerate doublet operator
    (reference: g_mubar/g_epsbar globals; input keys 2Kappamubar/2Kappaepsbar
    on BeginOperator DBTMWILSON / BeginMonomial NDRAT blocks)."""

    kappa: float
    mubar: float
    epsbar: float
    c_sw: float = 0.0
    theta: tuple[float, float, float, float] = (1.0, 0.0, 0.0, 0.0)

    def __post_init__(self):
        if 1.0 + self.mubar_t**2 <= self.epsbar_t**2:
            raise ValueError(
                "non-degenerate doublet needs 1 + (2k mubar)^2 > (2k epsbar)^2"
            )

    @property
    def mubar_t(self) -> float:
        return 2.0 * self.kappa * self.mubar

    @property
    def epsbar_t(self) -> float:
        return 2.0 * self.kappa * self.epsbar

    @property
    def wilson(self) -> DiracParams:
        """The flavor-diagonal hopping parameters (mu unused here)."""
        return DiracParams(kappa=self.kappa, mu=0.0, c_sw=self.c_sw, theta=self.theta)


def tau1(chi: jax.Array) -> jax.Array:
    """Flavor swap tau1 chi for doublets [2, 4, 3, ...]."""
    return chi[::-1]


def _imu_g5_tau3(chi: jax.Array, mubar_t: float, sign: float) -> jax.Array:
    """sign * i mubar_t gamma5 tau3 chi (tau3 = diag(+1, -1) in flavor).
    gamma5 acts on the SPIN axis, which is axis 1 for doublets [2,4,3,...]."""
    imu = jnp.asarray(1j * sign * mubar_t, chi.dtype)
    return jnp.stack([imu * apply_gamma5(chi[0]), -imu * apply_gamma5(chi[1])])


def mee_nd(chi: jax.Array, mubar_t: float, epsbar_t: float, sign: float = +1.0) -> jax.Array:
    """M_ee(+-) chi = (1 +- i mubar_t gamma5 tau3 + epsbar_t tau1) chi
    (identical for M_oo; reference: the nd flavor-diagonal block)."""
    eps = jnp.asarray(epsbar_t, chi.real.dtype)
    return chi + _imu_g5_tau3(chi, mubar_t, sign) + eps * tau1(chi)


def mee_inv_nd(chi: jax.Array, mubar_t: float, epsbar_t: float, sign: float = +1.0) -> jax.Array:
    """M_ee(+-)^{-1} chi — closed form (see module docstring)."""
    eps = jnp.asarray(epsbar_t, chi.real.dtype)
    inv = jnp.asarray(1.0 / (1.0 + mubar_t * mubar_t - epsbar_t * epsbar_t), chi.real.dtype)
    return (chi - _imu_g5_tau3(chi, mubar_t, sign) - eps * tau1(chi)) * inv


def _dslash_doublet(ueo, chi, p: int, lat: Lattice, phases) -> jax.Array:
    """Flavor-diagonal hopping on a doublet: H (x) 1_f."""
    return jnp.stack(
        [
            dslash_packed(ueo, chi[0], p, lat, phases),
            dslash_packed(ueo, chi[1], p, lat, phases),
        ]
    )


def m_hat_nd(
    ueo: jax.Array,
    chi_o: jax.Array,
    params: NDParams,
    lat: Lattice,
    phases,
    sign: float = +1.0,
) -> jax.Array:
    """Schur complement on odd sites:
    Mhat_nd(+-) = M_oo(+-) - kappa^2 H_oe M_ee(+-)^{-1} H_eo
    (reference: tm_operators_nd.c Mtm_nd application inside Qtm_pm_ndpsi)."""
    k2 = jnp.asarray(params.kappa * params.kappa, chi_o.real.dtype)
    tmp = _dslash_doublet(ueo, chi_o, EVEN, lat, phases)
    tmp = mee_inv_nd(tmp, params.mubar_t, params.epsbar_t, sign)
    tmp = _dslash_doublet(ueo, tmp, ODD, lat, phases)
    return mee_nd(chi_o, params.mubar_t, params.epsbar_t, sign) - k2 * tmp


def q_nd(
    ueo: jax.Array,
    chi_o: jax.Array,
    params: NDParams,
    lat: Lattice,
    phases,
) -> jax.Array:
    """Q_nd = gamma5 tau1 Mhat_nd — HERMITIAN by gamma5-tau1-hermiticity
    (reference: Qtm_ndpsi = gamma5 tau1 normalization of the nd operator)."""
    m = tau1(m_hat_nd(ueo, chi_o, params, lat, phases, +1.0))
    return jnp.stack([apply_gamma5(m[0]), apply_gamma5(m[1])])


def q_nd_sq(
    ueo: jax.Array,
    chi_o: jax.Array,
    params: NDParams,
    lat: Lattice,
    phases,
) -> jax.Array:
    """Q_nd^2 — hermitian positive-definite; the multishift-CG operator of
    the rational monomial (reference: Qtm_pm_ndpsi)."""
    return q_nd(ueo, q_nd(ueo, chi_o, params, lat, phases), params, lat, phases)
