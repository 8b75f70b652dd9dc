"""Wilson / twisted-mass Dirac operators, full-lattice and even/odd packed.

Reference: operator/Hopping_Matrix.c (`Hopping_Matrix`), operator/D_psi.c
(`D_psi`), operator/tm_operators.c (`Mtm_plus_psi`, `Qtm_plus_psi`,
`Qtm_pm_psi`, `mul_one_pm_imu_inv`), boundary.c (`boundary` phases ka_mu).

Conventions (survey Appendix A, tmLQCD normalization with fields rescaled by
2 kappa):

    M psi = (1 + i mutld gamma5) psi
            - kappa * sum_mu [ ph_mu   (1 - gamma_mu) U_mu(x)      psi(x+mu)
                             + ph_mu^* (1 + gamma_mu) U_mu(x-mu)^+ psi(x-mu) ]

with mutld = 2 kappa mu_tm and boundary phases ph_mu = exp(i pi theta_mu /
L_mu) folded into the hopping (theta_T = 1: antiperiodic time BCs — the
reference folds them into ka_mu the same way).

Even/odd Schur preconditioning (reference invert_eo.c / tm_operators.c):

    M = [[ M_ee, M_eo ], [ M_oe, M_oo ]],  M_ee = 1 + i mutld gamma5
    Mhat = M_oo - M_oe M_ee^{-1} M_eo       (on odd sites)
    Qhat(+-) = gamma5 Mhat(+-mu);  Qhat_pm = Qhat(-) Qhat(+) = Qhat(+)^+ Qhat(+)

The hopping uses the rank-2 projector factorizations (1 -/+ gamma_mu) =
2 V V^+ from tmlqcd_tpu.gamma: project to a 2-spinor, one SU(3) mat-vec per
projected spin component, reconstruct — the community-standard 1320
flops/site dslash (reference: halfspinor_hopping.h machinery, arising here
from the isometry factorization instead of hand-coded macros).

LAYOUT (see tmlqcd_tpu.lattice): spinors [4 spin, 3 color, T, X, M]; gauge
full [3, 3, 4 mu, T, X, Mf], packed [2 parity, 3, 3, 4, T, X, M].  Spin/color
contractions act on leading axes; site dims stay minor (TPU lanes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu import su3
from tmlqcd_tpu.gamma import V_MINUS, V_PLUS, apply_gamma5
from tmlqcd_tpu.lattice import EVEN, ODD, Lattice, hop_packed, shift_full

__all__ = [
    "DiracParams",
    "boundary_phases",
    "dslash_full",
    "d_full",
    "dslash_packed",
    "mee_packed",
    "mee_inv_packed",
    "m_hat",
    "q_hat",
    "q_hat_pm",
]


@dataclasses.dataclass(frozen=True)
class DiracParams:
    """Static physics parameters of one Wilson twisted-mass(-clover) operator
    (reference: operator.c per-operator kappa/mu/c_sw/theta; g_kappa/g_mu/
    g_c_sw globals).  c_sw = 0 selects the plain twisted-mass operator; the
    clover operators in ops/clover.py consume c_sw != 0."""

    kappa: float
    mu: float = 0.0  # twisted mass
    c_sw: float = 0.0  # clover coefficient
    theta: tuple[float, float, float, float] = (1.0, 0.0, 0.0, 0.0)

    @property
    def mutld(self) -> float:
        """2*kappa*mu — the twisted diagonal after 2kappa rescaling."""
        return 2.0 * self.kappa * self.mu


def boundary_phases(params: DiracParams, lat: Lattice) -> np.ndarray:
    """Per-direction hopping phases exp(i pi theta_mu / L_mu) as a NUMPY
    constant (folded into einsums at trace time; reference: boundary.c
    `boundary(kappa)` -> ka0..ka3 with kappa factored out)."""
    return np.array(
        [np.exp(1j * np.pi * params.theta[mu] / lat.dims[mu]) for mu in range(4)],
        dtype=np.complex128,
    )


def _c(z: complex, dtype) -> np.ndarray:
    """Trace-time complex constant typed to the field dtype (never a bare
    Python complex — see the C128-on-TPU note in tmlqcd_tpu.lattice)."""
    return np.asarray(z, np.complex64 if dtype == jnp.complex64 else np.complex128)[()]


def _spin_mix(coeff: np.ndarray, psi: jax.Array, n_out: int) -> list:
    """out[a][c] = sum_s coeff[a, s] psi[s][c] with trace-time constants;
    unrolled so no dot_general is emitted (TPU layout: see su3.mul).
    psi indexed [spin][color]; returns a list of n_out lists of 3 site-arrays.
    """
    out = []
    for a in range(n_out):
        row = []
        for c in range(3):
            acc = None
            for s in range(coeff.shape[1]):
                z = coeff[a, s]
                if z == 0.0:
                    continue
                term = _c(z, psi.dtype) * psi[s, c]
                acc = term if acc is None else acc + term
            row.append(acc if acc is not None else jnp.zeros_like(psi[0, 0]))
        out.append(row)
    return out


def _accum_hop(out, v_iso: np.ndarray, scale: complex, u: jax.Array, psi: jax.Array, adjoint: bool):
    """Accumulate scale * (2 V V^+) (x) U^(+) psi into the 4x3 component list
    `out` (lists of site-arrays, stacked ONCE by the caller).

    Component-list form matters: stacking/adding whole [4,3,...] arrays per
    direction creates materialization boundaries; per-component expression
    trees let XLA fuse the full 8-direction stencil into one pass per output
    component.  No dot_general anywhere on TPU (it would pad the tiny
    contraction dims to 8x128 tiles — measured 57x expansion); on CPU the
    compact einsum form keeps graphs ~5x smaller (see su3._compact_algebra).
    """
    from tmlqcd_tpu.su3 import _compact_algebra

    vh = np.ascontiguousarray(v_iso.conj().T)  # [2, 4]
    v2 = np.ascontiguousarray(2.0 * scale * v_iso)  # [4, 2]
    if _compact_algebra():
        # broadcast+reduce over the tiny axes, NOT dot_general — preserves
        # bitwise vmap == unvmapped (see su3._compact_algebra)
        ext = (1,) * (psi.ndim - 2)
        vhc = jnp.asarray(vh, psi.dtype).reshape(2, 4, 1, *ext)
        hc = jnp.sum(vhc * psi[None], axis=1)  # [2(a), 3(c), ...]
        um = jnp.conj(u) if adjoint else u
        # uh[a, i] = sum_j um[i, j] h[a, j] (adjoint: sum_j conj(u)[j, i] h[a, j])
        if adjoint:
            uh = jnp.sum(um[None] * hc[:, :, None], axis=1)
        else:
            uh = jnp.sum(um[None] * hc[:, None], axis=2)
        v2c = jnp.asarray(v2, psi.dtype).reshape(4, 2, 1, *ext)
        term = jnp.sum(v2c * uh[None], axis=1)  # [4(s), 3(c), ...]
        for s in range(4):
            for c in range(3):
                t = term[s, c]
                out[s][c] = t if out[s][c] is None else out[s][c] + t
        return out
    h = _spin_mix(vh, psi, 2)  # h[a][c]
    if adjoint:
        uc = jnp.conj(u)
        uh = [[uc[0, i] * h[a][0] + uc[1, i] * h[a][1] + uc[2, i] * h[a][2] for i in range(3)]
              for a in range(2)]
    else:
        uh = [[u[i, 0] * h[a][0] + u[i, 1] * h[a][1] + u[i, 2] * h[a][2] for i in range(3)]
              for a in range(2)]
    for s in range(4):
        for c in range(3):
            term = _c(v2[s, 0], psi.dtype) * uh[0][c] + _c(v2[s, 1], psi.dtype) * uh[1][c]
            out[s][c] = term if out[s][c] is None else out[s][c] + term
    return out


def _stack_components(out) -> jax.Array:
    return jnp.stack([jnp.stack(row) for row in out])


def dslash_full(u: jax.Array, psi: jax.Array, phases: np.ndarray, lat: Lattice) -> jax.Array:
    """Full-lattice hopping sum H psi (no kappa, no diagonal):

        (H psi)(x) = sum_mu [ ph_mu (1-g_mu) U_mu(x) psi(x+mu)
                            + ph_mu^* (1+g_mu) U_mu(x-mu)^+ psi(x-mu) ]

    Reference: operator/D_psi.c hopping part; oracle for the packed impl.
    u: [3, 3, 4, T, X, Mf]; psi: [4, 3, T, X, Mf].
    """
    out = [[None] * 3 for _ in range(4)]
    for mu in range(4):
        umu = u[:, :, mu]
        fwd = shift_full(psi, mu, +1, lat)
        out = _accum_hop(out, V_MINUS[mu], phases[mu], umu, fwd, adjoint=False)
        bwd = shift_full(psi, mu, -1, lat)
        ub = shift_full(umu, mu, -1, lat)
        out = _accum_hop(out, V_PLUS[mu], np.conj(phases[mu]), ub, bwd, adjoint=True)
    return _stack_components(out)


def d_full(u: jax.Array, psi: jax.Array, params: DiracParams, lat: Lattice) -> jax.Array:
    """Full twisted-mass Wilson operator (2-kappa normalization):
    M psi = (1 + i mutld g5) psi - kappa H psi (reference: D_psi.c)."""
    ph = boundary_phases(params, lat)
    imu = jnp.asarray(1j * params.mutld, psi.dtype)
    diag = psi + imu * apply_gamma5(psi)
    return diag - jnp.asarray(params.kappa, psi.real.dtype) * dslash_full(u, psi, ph, lat)


def dslash_packed(
    ueo: jax.Array,
    psi_q: jax.Array,
    p: int,
    lat: Lattice,
    phases: np.ndarray,
) -> jax.Array:
    """Even/odd hopping H_{p,q} psi_q -> parity-p sites (q = 1-p).

    Reference: Hopping_Matrix(ieo, out, in).  ueo: [2, 3, 3, 4, T, X, M];
    psi_q: [4, 3, T, X, M].  Neighbor access via lattice.hop_packed (rolls +
    static masked selects) — shards cleanly via GSPMD collective-permutes.
    """
    q = 1 - p
    out = [[None] * 3 for _ in range(4)]
    for mu in range(4):
        # forward: ph (1-g_mu) U_mu(x) psi(x+mu); U_mu(x) lives on parity p
        fwd = hop_packed(psi_q, p, mu, +1, lat)
        out = _accum_hop(out, V_MINUS[mu], phases[mu], ueo[p, :, :, mu], fwd, adjoint=False)
        # backward: ph^* (1+g_mu) U_mu(x-mu)^+ psi(x-mu); U_mu(x-mu) on parity q
        bwd = hop_packed(psi_q, p, mu, -1, lat)
        ub = hop_packed(ueo[q, :, :, mu], p, mu, -1, lat)
        out = _accum_hop(out, V_PLUS[mu], np.conj(phases[mu]), ub, bwd, adjoint=True)
    return _stack_components(out)


def mee_packed(psi: jax.Array, mutld: float, sign: float = +1.0) -> jax.Array:
    """M_ee(+-) psi = (1 +- i mutld gamma5) psi (diagonal; same for M_oo)."""
    imu = jnp.asarray(1j * sign * mutld, psi.dtype)
    return psi + imu * apply_gamma5(psi)


def mee_inv_packed(psi: jax.Array, mutld: float, sign: float = +1.0) -> jax.Array:
    """M_ee(+-)^{-1} psi = (1 -+ i mutld gamma5) psi / (1 + mutld^2)
    (reference: tm_operators.c `mul_one_pm_imu_inv` — why twisted mass makes
    e/o preconditioning trivial)."""
    imu = jnp.asarray(1j * sign * mutld, psi.dtype)
    inv = jnp.asarray(1.0 / (1.0 + mutld * mutld), psi.real.dtype)
    return (psi - imu * apply_gamma5(psi)) * inv


def m_hat(
    ueo: jax.Array,
    psi_o: jax.Array,
    params: DiracParams,
    lat: Lattice,
    phases: np.ndarray,
    sign: float = +1.0,
) -> jax.Array:
    """Schur complement on odd sites:
    Mhat(+-) psi = (1 +- i mutld g5) psi - kappa^2 H_oe M_ee(+-)^{-1} H_eo psi
    (reference: tm_operators.c `Mtm_plus_psi`, asymmetric variant)."""
    k2 = jnp.asarray(params.kappa * params.kappa, psi_o.real.dtype)
    tmp = dslash_packed(ueo, psi_o, EVEN, lat, phases)  # H_eo psi_o -> even
    tmp = mee_inv_packed(tmp, params.mutld, sign)
    tmp = dslash_packed(ueo, tmp, ODD, lat, phases)  # H_oe -> odd
    return mee_packed(psi_o, params.mutld, sign) - k2 * tmp


def q_hat(
    ueo: jax.Array,
    psi_o: jax.Array,
    params: DiracParams,
    lat: Lattice,
    phases: np.ndarray,
    sign: float = +1.0,
) -> jax.Array:
    """Qhat(+-) = gamma5 Mhat(+-) (reference: Qtm_plus_psi/Qtm_minus_psi)."""
    return apply_gamma5(m_hat(ueo, psi_o, params, lat, phases, sign))


def q_hat_pm(
    ueo: jax.Array,
    psi_o: jax.Array,
    params: DiracParams,
    lat: Lattice,
    phases: np.ndarray,
) -> jax.Array:
    """Qhat_pm = Qhat(-) Qhat(+) = Qhat(+)^+ Qhat(+) — the hermitian
    positive-definite CG operator (reference: Qtm_pm_psi)."""
    tmp = q_hat(ueo, psi_o, params, lat, phases, +1.0)
    return q_hat(ueo, tmp, params, lat, phases, -1.0)
