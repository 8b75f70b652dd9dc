"""Clover (Sheikholeslami-Wohlert) term: field strength, 6x6 spin-block
algebra, twisted-clover even/odd operators, and the trlog.

Reference: operator/clover_leaf.c (`sw_term`, `sw_invert`, 6x6 block
inverses), operator/clovertm_operators.c (`Qsw_pm_psi` ...),
monomial/clovertrlog_monomial.c.

Physics (survey Appendix A): the O(a)-improvement term adds to the Wilson
diagonal

    T(x) = - kappa c_sw sum_{mu<nu} sigma_munu (x) G_munu(x),
    G_munu = -i/8 [ Q_munu - Q_munu^+ ]   (hermitian field strength),

where Q_munu is the sum of the four "clover leaf" plaquettes around x.  The
twisted-clover even/even block becomes M_ee = 1 + T + i mutld gamma5 — no
longer trivially invertible (the twisted inverse of tm_operators.c), so the
reference LU-inverts 6x6 blocks per site (sw_invert).

TPU-native design: sigma_munu commutes with gamma5 (it is a product of two
gammas), so T is block-diagonal in the two chirality halves: two hermitian
6x6 = (2 spin x 3 color) blocks per site.  Instead of batched
jnp.linalg on trailing (6,6) axes (TPU would tile-pad them ~21x and the LU
would not fuse), the inverse is a closed-form 2x2-block Schur complement of
3x3 color blocks, with 3x3 inverses by adjugate/determinant — everything
unrolled SoA expressions over the site lanes, and fully differentiable (the
clover force, the reference's sw_deriv/sw_spinor machinery, comes from
jax.grad THROUGH this algebra for free).

Block storage: sw[2 chirality, 2, 2, 3, 3, T, X, M] — leading small dims,
site dims minor (see tmlqcd_tpu.lattice layout note).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tmlqcd_tpu import su3
from tmlqcd_tpu.gamma import SIGMA_MUNU
from tmlqcd_tpu.lattice import Lattice, eo_pack, shift_full

__all__ = [
    "PLANES",
    "field_strength",
    "sw_blocks",
    "sw_apply",
    "sw_inv_apply",
    "sw_logdet",
]

PLANES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

# sigma_munu restricted to the two chirality blocks (2x2 constants per plane).
_SIGMA_UP = np.stack([SIGMA_MUNU[mu, nu][0:2, 0:2] for mu, nu in PLANES])
_SIGMA_DN = np.stack([SIGMA_MUNU[mu, nu][2:4, 2:4] for mu, nu in PLANES])
for _i in range(len(PLANES)):
    # sanity: sigma is block-diagonal in this basis
    _mu, _nu = PLANES[_i]
    assert np.allclose(SIGMA_MUNU[_mu, _nu][0:2, 2:4], 0.0)
    assert np.allclose(SIGMA_MUNU[_mu, _nu][2:4, 0:2], 0.0)


def clover_leaves(u: jax.Array, mu: int, nu: int, lat: Lattice) -> jax.Array:
    """Q_munu(x): sum of the four oriented plaquette leaves in the (mu,nu)
    plane touching x (reference: clover_leaf.c `sw_term` leaf sums)."""
    umu, unu = u[:, :, mu], u[:, :, nu]
    umu_d = su3.adj(umu)
    unu_d = su3.adj(unu)

    def s(f, d, dd):
        return shift_full(f, d, dd, lat)

    # leaf 1: x -> x+mu -> x+mu+nu -> x+nu -> x
    l1 = su3.mul(su3.mul(umu, s(unu, mu, +1)), su3.adj(su3.mul(unu, s(umu, nu, +1))))
    umu_mm = s(umu, mu, -1)  # U_mu(x-mu)
    unu_mn = s(unu, nu, -1)  # U_nu(x-nu)
    # leaf 2: U_nu(x) U_mu(x-mu+nu)^+ U_nu(x-mu)^+ U_mu(x-mu)
    l2 = su3.mul(
        su3.mul(unu, su3.adj(s(umu_mm, nu, +1))),
        su3.mul(su3.adj(s(unu, mu, -1)), umu_mm),
    )
    # leaf 3: U_mu(x-mu)^+ U_nu(x-mu-nu)^+ U_mu(x-mu-nu) U_nu(x-nu)
    unu_mm_mn = s(s(unu, mu, -1), nu, -1)
    umu_mm_mn = s(umu_mm, nu, -1)
    l3 = su3.mul(
        su3.mul(su3.adj(umu_mm), su3.adj(unu_mm_mn)),
        su3.mul(umu_mm_mn, unu_mn),
    )
    # leaf 4: U_nu(x-nu)^+ U_mu(x-nu) U_nu(x+mu-nu) U_mu(x)^+
    l4 = su3.mul(
        su3.mul(su3.adj(unu_mn), s(umu, nu, -1)),
        su3.mul(s(s(unu, nu, -1), mu, +1), umu_d),
    )
    return l1 + l2 + l3 + l4


def field_strength(u: jax.Array, lat: Lattice) -> list:
    """Hermitian traceless clover field strength G_munu = -i/8 (Q - Q^+),
    traceless part, one [3,3,T,X,Mf] array per plane in PLANES order."""
    gs = []
    for mu, nu in PLANES:
        q = clover_leaves(u, mu, nu, lat)
        ah = q - su3.adj(q)  # antihermitian (2i * Im part)
        ah = ah - (su3.trace(ah) / 3.0) * jnp.eye(3, dtype=u.dtype).reshape(
            (3, 3) + (1,) * (u.ndim - 3)
        )
        # G = -i/8 * ah: hermitian traceless
        g = jax.lax.complex(jnp.imag(ah) / 8.0, -jnp.real(ah) / 8.0).astype(u.dtype)
        gs.append(g)
    return gs


def _c(z: complex, dtype):
    return np.asarray(z, np.complex64 if dtype == jnp.complex64 else np.complex128)[()]


def sw_blocks(u: jax.Array, kappa: float, c_sw: float, lat: Lattice) -> jax.Array:
    """The clover term T as two chirality blocks per site:

        sw[b, s, s', :, :, sites] = -kappa c_sw sum_planes
                                     sigma_b[plane][s,s'] * G_plane

    Returns [2, 2, 2, 3, 3, T, X, Mf] (full lattice; e/o views via eo_pack).
    Hermitian: sw[b,s,s']^+ = sw[b,s',s].  (reference: sw_term filling
    sw[VOLUME][3][2]; here AD-differentiable for the clover force.)
    """
    gs = field_strength(u, lat)
    coeff = -kappa * c_sw
    blocks = []
    for sig in (_SIGMA_UP, _SIGMA_DN):
        blk = []
        for s in range(2):
            row = []
            for sp in range(2):
                acc = None
                for ip in range(len(PLANES)):
                    z = sig[ip][s, sp]
                    if z == 0.0:
                        continue
                    term = _c(coeff * z, u.dtype) * gs[ip]
                    acc = term if acc is None else acc + term
                if acc is None:
                    acc = jnp.zeros_like(gs[0])
                row.append(acc)
            blk.append(jnp.stack(row))
        blocks.append(jnp.stack(blk))
    return jnp.stack(blocks)  # [2, 2, 2, 3, 3, ...]


def sw_apply(sw: jax.Array, psi: jax.Array, mutld: float, sign: float = +1.0) -> jax.Array:
    """(1 + T + i sign mutld gamma5) psi for packed/full spinors [4,3,...].

    Chirality blocks: spins (0,1) get +i mutld, spins (2,3) get -i mutld.
    (reference: clovertm_operators.c `Msw_ee` application.)
    """
    from tmlqcd_tpu.su3 import _compact_algebra

    imu = jnp.asarray(1j * sign * mutld, psi.dtype)
    if _compact_algebra():
        # compact CPU form (see su3._compact_algebra): psi as [b, s, c, ...];
        # broadcast+reduce (not dot_general) keeps vmap bitwise-faithful
        pb = psi.reshape((2, 2) + psi.shape[1:])
        pm = jnp.asarray([1.0, -1.0], psi.real.dtype).reshape(
            (2, 1, 1) + (1,) * (psi.ndim - 2)
        )
        diag = pb + (pm * imu) * pb
        # tpsi[b,s,c] = sum_{t,d} sw[b,s,t,c,d] pb[b,t,d]
        tpsi = jnp.sum(sw * pb[:, None, :, None], axis=(2, 4))
        return (diag + tpsi).reshape(psi.shape)
    out_rows = []
    for b, (s0, pm) in enumerate(((0, +1.0), (2, -1.0))):
        for s in range(2):
            row = []
            for c in range(3):
                acc = psi[s0 + s, c] + (pm * imu) * psi[s0 + s, c]
                # T psi: sum over s', c'
                for sp in range(2):
                    blkm = sw[b, s, sp]
                    for cp in range(3):
                        acc = acc + blkm[c, cp] * psi[s0 + sp, cp]
                row.append(acc)
            out_rows.append(jnp.stack(row))
    return jnp.stack(out_rows)


def _inv3(m):
    """Closed-form 3x3 inverse (adjugate / det) on leading axes — unrolled
    SoA (no batched linalg: TPU would tile-pad trailing (3,3) dims)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    rows = [
        [co_a, -(b * i - c * h), (b * f - c * e)],
        [co_b, (a * i - c * g), -(a * f - c * d)],
        [co_c, -(a * h - b * g), (a * e - b * d)],
    ]
    return jnp.stack([jnp.stack([x * inv_det for x in r]) for r in rows]), det


def _block66(sw_b, mutld_term, dtype, _ndim_unused=None):
    """Assemble A = (1 + i mu term) I + T_b as 2x2 of 3x3: (P, Q, R, S)."""
    eye = jnp.eye(3, dtype=dtype).reshape((3, 3) + (1,) * (sw_b[0, 0].ndim - 2))
    diag = (1.0 + mutld_term) * eye
    p = sw_b[0, 0] + diag
    q = sw_b[0, 1]
    r = sw_b[1, 0]
    s = sw_b[1, 1] + diag
    return p, q, r, s


def _schur_inv_apply(p, q, r, s, v0, v1):
    """Solve [[P,Q],[R,S]] [x0;x1] = [v0;v1] via the Schur complement of P.
    v0, v1: color vectors [3, ...]. Returns (x0, x1, det) with
    det = det(P) det(S - R P^{-1} Q)."""
    pinv, detp = _inv3(p)
    rpinv = su3.mul(r, pinv)
    stilde = s - su3.mul(rpinv, q)
    stinv, dets = _inv3(stilde)
    # x1 = Stilde^{-1} (v1 - R P^{-1} v0)
    x1 = su3.matvec(stinv, v1 - su3.matvec(rpinv, v0))
    # x0 = P^{-1} (v0 - Q x1)
    x0 = su3.matvec(pinv, v0 - su3.matvec(q, x1))
    return x0, x1, detp * dets


def sw_inv_apply(sw: jax.Array, psi: jax.Array, mutld: float, sign: float = +1.0) -> jax.Array:
    """(1 + T + i sign mutld gamma5)^{-1} psi — the clover M_ee inverse
    (reference: sw_invert + `Msw_ee_inv` application), via per-chirality
    2x2-block Schur solves in closed form."""
    imu = 1j * sign * mutld
    outs = []
    for b, (s0, pm) in enumerate(((0, +1.0), (2, -1.0))):
        mt = jnp.asarray(pm * imu, psi.dtype)
        p, q, r, s = _block66(sw[b], mt, psi.dtype, psi.ndim - 1)
        v0 = psi[s0]  # [3, ...]
        v1 = psi[s0 + 1]
        x0, x1, _ = _schur_inv_apply(p, q, r, s, v0, v1)
        outs.extend([x0, x1])
    return jnp.stack(outs)


def sw_logdet(sw: jax.Array, mutld: float, sign: float = +1.0) -> jax.Array:
    """sum_sites log |det (1 + T + i sign mutld gamma5)|^2, f64-accumulated —
    the trlog of the clover even/even block (reference:
    clovertrlog_monomial.c).  |.|^2 because the two-flavor weight is
    det M_ee(+mu) det M_ee(-mu) = |det M_ee(+mu)|^2."""
    imu = 1j * sign * mutld
    total = jnp.asarray(0.0, jnp.float64)
    for b, (s0, pm) in enumerate(((0, +1.0), (2, -1.0))):
        mt = jnp.asarray(pm * imu, sw.dtype)
        p, q, r, s = _block66(sw[b], mt, sw.dtype, sw.ndim - 3)
        pinv, detp = _inv3(p)
        stilde = s - su3.mul(su3.mul(r, pinv), q)
        _, dets = _inv3(stilde)
        det = detp * dets
        total = total + jnp.sum(jnp.log(jnp.abs(det).astype(jnp.float64) ** 2))
    return total


# ---------------------------------------------------------------------------
# Even/odd twisted-clover operators (reference: clovertm_operators.c
# Qsw_plus_psi / Qsw_pm_psi; invert_clover_eo.c)
# ---------------------------------------------------------------------------


def sw_blocks_eo(u: jax.Array, kappa: float, c_sw: float, lat: Lattice):
    """(sw_even, sw_odd): the clover blocks packed to the two parities
    (reference: sw_term fills both; sw_invert only needs even)."""
    sw = sw_blocks(u, kappa, c_sw, lat)
    return eo_pack(sw, lat)


def m_hat_clover(ueo, sw_e, sw_o, psi_o, params, lat: Lattice, phases, sign: float = +1.0):
    """Clover Schur complement on odd sites:
    Mhat(+-) = M_oo(+-) - kappa^2 H_oe M_ee(+-)^{-1} H_eo,
    with M_pp = 1 + T_pp +- i mutld gamma5 (clover on BOTH parities)."""
    from tmlqcd_tpu.lattice import EVEN, ODD
    from tmlqcd_tpu.ops.wilson import dslash_packed

    k2 = jnp.asarray(params.kappa * params.kappa, psi_o.real.dtype)
    tmp = dslash_packed(ueo, psi_o, EVEN, lat, phases)
    tmp = sw_inv_apply(sw_e, tmp, params.mutld, sign)
    tmp = dslash_packed(ueo, tmp, ODD, lat, phases)
    return sw_apply(sw_o, psi_o, params.mutld, sign) - k2 * tmp


def q_hat_clover(ueo, sw_e, sw_o, psi_o, params, lat: Lattice, phases, sign: float = +1.0):
    """Qsw(+-) = gamma5 Mhat_sw(+-) (reference: Qsw_plus_psi)."""
    from tmlqcd_tpu.gamma import apply_gamma5

    return apply_gamma5(m_hat_clover(ueo, sw_e, sw_o, psi_o, params, lat, phases, sign))


def q_hat_pm_clover(ueo, sw_e, sw_o, psi_o, params, lat: Lattice, phases):
    """Qsw_pm = Qsw(-) Qsw(+) — hermitian positive CG operator
    (reference: Qsw_pm_psi)."""
    tmp = q_hat_clover(ueo, sw_e, sw_o, psi_o, params, lat, phases, +1.0)
    return q_hat_clover(ueo, sw_e, sw_o, tmp, params, lat, phases, -1.0)


# ---------------------------------------------------------------------------
# Non-degenerate (strange/charm) clover doublet (reference:
# operator/clovertm_operators.c Qsw_*_ndpsi, sw_invert_nd,
# monomial/clovernd_trlog_monomial.c)
# ---------------------------------------------------------------------------


def _sw_c_blocks(sw_b, dtype):
    """C = 1 + T for one chirality as 2x2 color blocks (P, Q, R, S)."""
    eye = jnp.eye(3, dtype=dtype).reshape((3, 3) + (1,) * (sw_b[0, 0].ndim - 2))
    return sw_b[0, 0] + eye, sw_b[0, 1], sw_b[1, 0], sw_b[1, 1] + eye


def _blk_sq(p, q, r, s):
    """(P,Q,R,S)^2 in 2x2-of-3x3 block form."""
    return (
        su3.mul(p, p) + su3.mul(q, r),
        su3.mul(p, q) + su3.mul(q, s),
        su3.mul(r, p) + su3.mul(s, r),
        su3.mul(r, q) + su3.mul(s, s),
    )


def _apply_c(sw_b, v0, v1, dtype):
    """C v for color vectors (v0, v1) of one chirality."""
    p, q, r, s = _sw_c_blocks(sw_b, dtype)
    return (
        su3.matvec(p, v0) + su3.matvec(q, v1),
        su3.matvec(r, v0) + su3.matvec(s, v1),
    )


def mee_nd_clover(sw, chi, mubar_t: float, epsbar_t: float, sign: float = +1.0):
    """M_ee^nd chi = (C (x) 1_f + i sign mubar gamma5 tau3 + epsbar tau1) chi
    for doublets chi [2, 4, 3, ...], C = 1 + T (clover blocks sw)."""
    up = sw_apply(sw, chi[0], sign * mubar_t, +1.0)
    dn = sw_apply(sw, chi[1], sign * mubar_t, -1.0)
    eps = jnp.asarray(epsbar_t, chi.real.dtype)
    return jnp.stack([up + eps * chi[1], dn + eps * chi[0]])


def mee_inv_nd_clover(sw, chi, mubar_t: float, epsbar_t: float, sign: float = +1.0):
    """M_ee^nd inverse, closed form: since [T, gamma5] = 0 all flavor blocks
    commute and

        M^{-1} = [[C - i mu g5, -eps], [-eps, C + i mu g5]] / D,
        D = C^2 + mu^2 - eps^2   (per chirality 6x6, Schur-inverted)

    (reference: sw_invert_nd's per-site 6x6 inverses)."""
    imu = 1j * sign * mubar_t
    eps = jnp.asarray(epsbar_t, chi.real.dtype)
    shift = mubar_t * mubar_t - epsbar_t * epsbar_t
    outs_u, outs_d = [], []
    for b, (s0, pm) in enumerate(((0, +1.0), (2, -1.0))):
        mt = jnp.asarray(pm * imu, chi.dtype)
        # numerators: (C -+ i mu g5) chi_f - eps chi_{f'}
        cu = _apply_c(sw[b], chi[0, s0], chi[0, s0 + 1], chi.dtype)
        cd = _apply_c(sw[b], chi[1, s0], chi[1, s0 + 1], chi.dtype)
        nu = [cu[i] - mt * chi[0, s0 + i] - eps * chi[1, s0 + i] for i in range(2)]
        nd = [cd[i] + mt * chi[1, s0 + i] - eps * chi[0, s0 + i] for i in range(2)]
        # D = C^2 + shift (per chirality), Schur solve for both flavors
        p, q, r, s = _sw_c_blocks(sw[b], chi.dtype)
        p2, q2, r2, s2 = _blk_sq(p, q, r, s)
        eye = jnp.eye(3, dtype=chi.dtype).reshape(
            (3, 3) + (1,) * (p2.ndim - 2)
        )
        sh = jnp.asarray(shift, chi.real.dtype)
        p2 = p2 + sh * eye
        s2 = s2 + sh * eye
        xu0, xu1, _ = _schur_inv_apply(p2, q2, r2, s2, nu[0], nu[1])
        xd0, xd1, _ = _schur_inv_apply(p2, q2, r2, s2, nd[0], nd[1])
        outs_u.extend([xu0, xu1])
        outs_d.extend([xd0, xd1])
    return jnp.stack([jnp.stack(outs_u), jnp.stack(outs_d)])


def sw_logdet_nd(sw, mubar_t: float, epsbar_t: float) -> jax.Array:
    """sum_sites log det M_ee^nd = sum_chirality log det(C^2 + mu^2 - eps^2)
    — the even/even factor of the nd clover determinant (reference:
    monomial/clovernd_trlog_monomial.c).  f64-accumulated."""
    shift = mubar_t * mubar_t - epsbar_t * epsbar_t
    total = jnp.asarray(0.0, jnp.float64)
    for b in range(2):
        p, q, r, s = _sw_c_blocks(sw[b], sw.dtype)
        p2, q2, r2, s2 = _blk_sq(p, q, r, s)
        eye = jnp.eye(3, dtype=sw.dtype).reshape((3, 3) + (1,) * (p2.ndim - 2))
        sh = jnp.asarray(shift, jnp.float32 if sw.dtype == jnp.complex64 else jnp.float64)
        p2 = p2 + sh * eye
        s2 = s2 + sh * eye
        pinv, detp = _inv3(p2)
        stilde = s2 - su3.mul(su3.mul(r2, pinv), q2)
        _, dets = _inv3(stilde)
        det = detp * dets
        total = total + jnp.sum(jnp.log(jnp.abs(det).astype(jnp.float64)))
    return total


def m_hat_nd_clover(ueo, sw_e, sw_o, chi_o, params, lat: Lattice, phases, sign: float = +1.0):
    """Clover nd Schur complement on odd sites (reference: the Qsw_ndpsi
    stack): Mhat = M_oo^nd - kappa^2 H_oe (M_ee^nd)^{-1} H_eo, H
    flavor-diagonal."""
    from tmlqcd_tpu.lattice import EVEN, ODD
    from tmlqcd_tpu.ops.wilson import dslash_packed

    k2 = jnp.asarray(params.kappa * params.kappa, chi_o.real.dtype)
    tmp = jnp.stack(
        [
            dslash_packed(ueo, chi_o[0], EVEN, lat, phases),
            dslash_packed(ueo, chi_o[1], EVEN, lat, phases),
        ]
    )
    tmp = mee_inv_nd_clover(sw_e, tmp, params.mubar_t, params.epsbar_t, sign)
    tmp = jnp.stack(
        [
            dslash_packed(ueo, tmp[0], ODD, lat, phases),
            dslash_packed(ueo, tmp[1], ODD, lat, phases),
        ]
    )
    return mee_nd_clover(sw_o, chi_o, params.mubar_t, params.epsbar_t, sign) - k2 * tmp


def q_nd_clover(ueo, sw_e, sw_o, chi_o, params, lat: Lattice, phases):
    """Q_nd^sw = gamma5 tau1 Mhat_nd^sw — hermitian (reference: Qsw_ndpsi)."""
    from tmlqcd_tpu.gamma import apply_gamma5

    m = m_hat_nd_clover(ueo, sw_e, sw_o, chi_o, params, lat, phases, +1.0)[::-1]
    return jnp.stack([apply_gamma5(m[0]), apply_gamma5(m[1])])


def mee_blocks(sw: jax.Array, mutld: float, sign: float = +1.0) -> jax.Array:
    """Materialize M_ee(+-) = 1 + T +- i mutld gamma5 as explicit 6x6 blocks
    [2(chir), 2, 2, 3, 3, sites] (for the fast/block-matvec path)."""
    rows = []
    for b, (s0, pm) in enumerate(((0, +1.0), (2, -1.0))):
        mt = jnp.asarray(pm * 1j * sign * mutld, sw.dtype)
        p, q, r, s = _block66(sw[b], mt, sw.dtype)
        rows.append(jnp.stack([jnp.stack([p, q]), jnp.stack([r, s])]))
    return jnp.stack(rows)


def mee_inv_blocks(sw: jax.Array, mutld: float, sign: float = +1.0) -> jax.Array:
    """Materialize M_ee(+-)^{-1} as explicit blocks, computed ONCE per gauge
    (reference: sw_invert stores the inverted 6x6 blocks; here via the
    2x2-of-3x3 Schur closed form).  Same layout as mee_blocks."""
    rows = []
    for b, (s0, pm) in enumerate(((0, +1.0), (2, -1.0))):
        mt = jnp.asarray(pm * 1j * sign * mutld, sw.dtype)
        p, q, r, s = _block66(sw[b], mt, sw.dtype)
        pinv, _ = _inv3(p)
        rp = su3.mul(r, pinv)  # R P^{-1}
        stilde = s - su3.mul(rp, q)
        sti, _ = _inv3(stilde)
        pq = su3.mul(pinv, q)  # P^{-1} Q
        qi = -su3.mul(pq, sti)
        ri = -su3.mul(sti, rp)
        pi = pinv - su3.mul(qi, rp)
        rows.append(jnp.stack([jnp.stack([pi, qi]), jnp.stack([ri, sti])]))
    return jnp.stack(rows)


def _blk_mul(a, b):
    """Product of two 6x6 matrices in 2x2-of-3x3 block form (P,Q,R,S)."""
    return (
        su3.mul(a[0], b[0]) + su3.mul(a[1], b[2]),
        su3.mul(a[0], b[1]) + su3.mul(a[1], b[3]),
        su3.mul(a[2], b[0]) + su3.mul(a[3], b[2]),
        su3.mul(a[2], b[1]) + su3.mul(a[3], b[3]),
    )


def _blk_inv(p, q, r, s):
    """Inverse of a 6x6 in 2x2-of-3x3 block form via the Schur complement."""
    pinv, _ = _inv3(p)
    rp = su3.mul(r, pinv)
    stilde = s - su3.mul(rp, q)
    sti, _ = _inv3(stilde)
    pq = su3.mul(pinv, q)
    qi = -su3.mul(pq, sti)
    ri = -su3.mul(sti, rp)
    pi = pinv - su3.mul(qi, rp)
    return pi, qi, ri, sti


def mee_inv_nd_blocks(sw: jax.Array, mubar_t: float, epsbar_t: float, sign: float = +1.0):
    """Materialize the flavor-2x2 inverse of M_ee^nd as three chirality-block
    fields (A, B, E), each [2(chir), 2, 2, 3, 3, sites] (reference:
    sw_invert_nd computed once per gauge):

        (M_ee^nd)^{-1} = [[A, -eps E], [-eps E, B]],
        A = (C - i sign mubar g5) D^{-1},  B = (C + i sign mubar g5) D^{-1},
        E = D^{-1},  D = C^2 + mubar^2 - eps^2   (per chirality; g5 = +-1).
    """
    outs = []
    for b, pm in ((0, +1.0), (1, -1.0)):
        mt = jnp.asarray(pm * 1j * sign * mubar_t, sw.dtype)
        cp = _block66(sw[b], mt, sw.dtype)  # C + i mu (this chirality)
        cm = _block66(sw[b], -mt, sw.dtype)  # C - i mu
        d = list(_blk_mul(cp, cm))  # C^2 + mu^2
        eye = jnp.eye(3, dtype=sw.dtype).reshape((3, 3) + (1,) * (d[0].ndim - 2))
        e2 = jnp.asarray(epsbar_t * epsbar_t, jnp.float64).astype(
            jnp.float32 if sw.dtype == jnp.complex64 else jnp.float64
        )
        d[0] = d[0] - e2 * eye
        d[3] = d[3] - e2 * eye
        e = _blk_inv(*d)
        a = _blk_mul(cm, e)
        bb = _blk_mul(cp, e)
        pack = lambda t: jnp.stack([jnp.stack(t[:2]), jnp.stack(t[2:])])
        outs.append((pack(a), pack(bb), pack(e)))
    return tuple(jnp.stack([outs[0][i], outs[1][i]]) for i in range(3))


def blocks_apply(blocks: jax.Array, psi: jax.Array) -> jax.Array:
    """Apply materialized chirality blocks [2,2,2,3,3,sites] to a spinor
    [4,3,sites]: out[s0+s] = sum_{s',c'} blocks[b,s,s'] psi[s0+s']."""
    outs = []
    for b, s0 in ((0, 0), (1, 2)):
        for s in range(2):
            acc0 = su3.matvec(blocks[b, s, 0], psi[s0])
            acc1 = su3.matvec(blocks[b, s, 1], psi[s0 + 1])
            outs.append(acc0 + acc1)
    return jnp.stack(outs)
