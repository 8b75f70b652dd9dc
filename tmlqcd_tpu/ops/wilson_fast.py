"""Split-complex (f32 re/im) twisted-mass operators on the Pallas dslash —
the TPU production hot path.

Reference: the `_32` single-precision operator stack of the reference
(tm_operators_32.c, Hopping_Matrix_32.c) — there the motivation was sloppy
precision; here the split layout is what lets the hopping run as a Mosaic
kernel (no complex dtype on the VPU) with zero per-application layout
conversion.  Solvers iterate directly on the split arrays: CG's dot products
Re<a,b> are plain f32 sums over the leading re/im axis, so tmlqcd_tpu's
generic solvers work unchanged.

Layout: psi [2, 4, 3, T, X, M] f32; gauge as FastGauge (pre-gathered
per-direction links, both parities, phases folded — see dslash_pallas).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tmlqcd_tpu.lattice import EVEN, ODD, Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import dslash_pallas as dp
from tmlqcd_tpu.ops.wilson import DiracParams, boundary_phases

__all__ = ["FastGauge", "make_fast_gauge", "q_hat_pm_fast", "q_hat_fast",
           "to_split", "from_split", "to_split_rhs", "from_split_rhs"]


@dataclasses.dataclass(frozen=True)
class FastGauge:
    """Pre-gathered split gauge for the Pallas dslash: ug[p] f32
    [2, 8, 3, 3, T, X, M] for each output parity p — or the 12-real
    compressed copy [2, 8, 2, 3, T, X, M] when gcomp (static row-2
    reconstruction constants from dp.gauge_corr) is set."""

    ug_even: jax.Array
    ug_odd: jax.Array
    gcomp: tuple | None = None


jax.tree_util.register_dataclass(
    FastGauge, data_fields=["ug_even", "ug_odd"], meta_fields=["gcomp"]
)


def default_compress() -> bool:
    """Production default for the 12-real compressed gauge copy (on; set
    TMLQCD_TPU_GCOMP=0 to stream full 18-real links)."""
    import os

    return os.environ.get("TMLQCD_TPU_GCOMP", "1") != "0"


def make_fast_gauge(
    u: jax.Array, params: DiracParams, lat: Lattice, sloppy: bool = False,
    compress: bool | None = None,
) -> FastGauge:
    """Full gauge [3,3,4,T,X,Mf] complex -> FastGauge (once per gauge
    update; reference: update_backward_gauge()).

    sloppy=True stores the gathered links in bfloat16 — the TPU analog of
    the reference's `_32` sloppy gauge copies (halfspinor32): halves the
    dominant dslash HBM stream; pair with mixed_cg defect correction.
    compress=True stores only the first two link rows (12 reals; the kernel
    reconstructs row 2 as phase-corrected conj(r0 x r1) — exact for SU(3)
    links up to rounding): cuts the dominant stream by another third.
    Both compose: sloppy+compress = 192 B/site of gauge vs 576 plain."""
    if compress is None:
        compress = default_compress()
    ph = boundary_phases(params, lat)
    ueo = pack_gauge_eo(u, lat)
    ug = dp.gauge_copy(ueo, lat, ph)
    gdt = jnp.bfloat16 if sloppy else jnp.float32
    ug_e = dp.split_c(ug[EVEN]).astype(gdt)
    ug_o = dp.split_c(ug[ODD]).astype(gdt)
    if compress:
        return FastGauge(
            ug_even=dp.compress_ug(ug_e),
            ug_odd=dp.compress_ug(ug_o),
            gcomp=dp.gauge_corr(ph),
        )
    return FastGauge(ug_even=ug_e, ug_odd=ug_o)


def to_split(psi: jax.Array) -> jax.Array:
    return dp.split_c(psi).astype(jnp.float32)


def from_split(psi2: jax.Array, dtype=jnp.complex64) -> jax.Array:
    return dp.merge_c(psi2, dtype)


def to_split_rhs(psis: jax.Array) -> jax.Array:
    """Batch of complex spinors [R, 4, 3, T, X, M] -> the multi-RHS split
    layout [2, 4, 3, R, T, X, M] (R inside the spin/color axes so the site
    dims stay minor-most; the kernel amortizes the gauge stream over R)."""
    return jnp.moveaxis(dp.split_c(psis).astype(jnp.float32), 1, 3)


def from_split_rhs(psi2: jax.Array, dtype=jnp.complex64) -> jax.Array:
    """[2, 4, 3, R, T, X, M] -> complex [R, 4, 3, T, X, M]."""
    return dp.merge_c(jnp.moveaxis(psi2, 3, 1), dtype)


def _gamma5(psi2: jax.Array) -> jax.Array:
    sign = jnp.asarray([1.0, 1.0, -1.0, -1.0], psi2.dtype).reshape(
        (1, 4) + (1,) * (psi2.ndim - 2)
    )
    return psi2 * sign


def _i_mul(psi2: jax.Array) -> jax.Array:
    """i * psi in split layout: (re, im) -> (-im, re)."""
    return jnp.stack([-psi2[1], psi2[0]])


def _mee_split(psi2: jax.Array, mutld: float, sign: float) -> jax.Array:
    """(1 + i sign mutld gamma5) psi."""
    return psi2 + jnp.float32(sign * mutld) * _i_mul(_gamma5(psi2))


def _mee_inv_split(psi2: jax.Array, mutld: float, sign: float) -> jax.Array:
    inv = jnp.float32(1.0 / (1.0 + mutld * mutld))
    return (psi2 - jnp.float32(sign * mutld) * _i_mul(_gamma5(psi2))) * inv


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests of the fast path)."""
    return jax.default_backend() != "tpu"


def m_hat_fast(
    fg: FastGauge, psi2_o: jax.Array, params: DiracParams, lat: Lattice,
    sign: float = +1.0, g5: bool = False,
) -> jax.Array:
    """Mhat(+-) on odd sites, split layout (reference: Mtm_plus_psi).

    Both the Mee^{-1} diagonal and the final Mee(psi) - k^2 H tmp assembly
    (plus the optional gamma5 of Qhat) are FUSED into the two hopping
    kernels' epilogues — the whole Schur complement is exactly two kernel
    launches with zero extra elementwise HBM passes (the reference runs
    mul_one_pm_imu_inv and the Mtm assembly as separate site loops)."""
    interp = _interpret()
    tmp = dp.hopping_pallas_split(
        fg.ug_even, psi2_o, EVEN, lat, interpret=interp,
        epi=("mee_inv", float(params.mutld), float(sign)),
        gcomp=fg.gcomp,
    )
    return dp.hopping_pallas_split(
        fg.ug_odd, tmp, ODD, lat, interpret=interp,
        epi=("mhat", float(params.mutld), float(sign),
             float(params.kappa * params.kappa), bool(g5)),
        psi_o=psi2_o,
        gcomp=fg.gcomp,
    )


def q_hat_fast(
    fg: FastGauge, psi2_o: jax.Array, params: DiracParams, lat: Lattice, sign: float = +1.0
) -> jax.Array:
    return m_hat_fast(fg, psi2_o, params, lat, sign, g5=True)


def q_hat_pm_fast(
    fg: FastGauge, psi2_o: jax.Array, params: DiracParams, lat: Lattice
) -> jax.Array:
    """Qhat_pm on split fields — the production CG operator
    (reference: Qtm_pm_psi)."""
    tmp = q_hat_fast(fg, psi2_o, params, lat, +1.0)
    return q_hat_fast(fg, tmp, params, lat, -1.0)


# ---------------------------------------------------------------------------
# Domain-decomposed operators on the sharded kernel path (reference: the
# MPI-decomposed Hopping_Matrix inside every CG iteration, survey §3.3 —
# here each shard runs the Mosaic kernel on its (t, y)-slab and the halos
# ride two ppermutes per hop, overlapped with the interior stencil)
# ---------------------------------------------------------------------------


def m_hat_fast_shard(
    fg: FastGauge,
    psi2_o: jax.Array,
    params: DiracParams,
    lat: Lattice,
    mesh,
    t_axis: str = "t",
    m_axis: str | None = None,
    sign: float = +1.0,
    g5: bool = False,
    halfspinor: bool = True,
    overlap: bool = True,
) -> jax.Array:
    """Mhat(+-) with both hops on the domain-decomposed Pallas kernel
    (hopping_pallas_shard); the elementwise diagonals run under GSPMD on
    the sharded arrays (no resharding — every op is slab-local)."""
    interp = _interpret()
    k2 = jnp.float32(params.kappa * params.kappa)
    hop = lambda ug, x, p: dp.hopping_pallas_shard(
        ug, x, p, lat, mesh, t_axis=t_axis, m_axis=m_axis,
        interpret=interp, halfspinor=halfspinor, overlap=overlap,
        gcomp=fg.gcomp,
    )
    tmp = hop(fg.ug_even, psi2_o, EVEN)
    tmp = _mee_inv_split(tmp, params.mutld, sign)
    tmp = hop(fg.ug_odd, tmp, ODD)
    out = _mee_split(psi2_o, params.mutld, sign) - k2 * tmp
    return _gamma5(out) if g5 else out


def q_hat_pm_fast_shard(
    fg: FastGauge, psi2_o: jax.Array, params: DiracParams, lat: Lattice, mesh,
    t_axis: str = "t", m_axis: str | None = None,
    halfspinor: bool = True, overlap: bool = True,
) -> jax.Array:
    """Qhat_pm on the sharded kernel path — the multi-chip production CG
    operator (reference: Qtm_pm_psi under MPI decomposition)."""
    kw = dict(t_axis=t_axis, m_axis=m_axis, halfspinor=halfspinor, overlap=overlap)
    tmp = m_hat_fast_shard(fg, psi2_o, params, lat, mesh, sign=+1.0, g5=True, **kw)
    return m_hat_fast_shard(fg, tmp, params, lat, mesh, sign=-1.0, g5=True, **kw)


def _m_hat_clover_fast_shard(
    fc: "FastClover", psi2_o: jax.Array, params: DiracParams, lat: Lattice,
    mesh, t_axis: str = "t", m_axis: str | None = None,
    sign: float = +1.0, g5: bool = False,
    halfspinor: bool = True, overlap: bool = True,
) -> jax.Array:
    """Clover Schur complement with both hops on the domain-decomposed
    Pallas kernel (reference: Qsw under MPI decomposition).  The clover
    block applications are strictly site-local, so they run as GSPMD
    elementwise block-matvecs on the sharded arrays (no resharding) rather
    than as kernel epilogues — the two extra spinor HBM passes the
    single-chip fused path saves are ~3% of the sharded hop's traffic."""
    k2 = jnp.float32(params.kappa * params.kappa)
    mee_inv = _blk_unflatten(fc.mee_inv_p if sign > 0 else fc.mee_inv_m)
    moo = _blk_unflatten(fc.moo_p if sign > 0 else fc.moo_m)
    hop = lambda ug, x, p: dp.hopping_pallas_shard(
        ug, x, p, lat, mesh, t_axis=t_axis, m_axis=m_axis,
        interpret=_interpret(), halfspinor=halfspinor, overlap=overlap,
        gcomp=fc.fg.gcomp,
    )
    tmp = hop(fc.fg.ug_even, psi2_o, EVEN)
    tmp = _blocks_apply_split(mee_inv, tmp)
    tmp = hop(fc.fg.ug_odd, tmp, ODD)
    out = _blocks_apply_split(moo, psi2_o) - k2 * tmp
    return _gamma5(out) if g5 else out


def q_hat_pm_clover_fast_shard(
    fc: "FastClover", psi2_o: jax.Array, params: DiracParams, lat: Lattice,
    mesh, t_axis: str = "t", m_axis: str | None = None,
    halfspinor: bool = True, overlap: bool = True,
) -> jax.Array:
    """Qsw_pm on the sharded kernel path (reference: Qsw_pm_psi under MPI
    decomposition) — the multi-chip production CG operator of
    CLOVERDET/CLOVERDETRATIO solves."""
    kw = dict(t_axis=t_axis, m_axis=m_axis, halfspinor=halfspinor, overlap=overlap)
    tmp = _m_hat_clover_fast_shard(fc, psi2_o, params, lat, mesh, sign=+1.0, g5=True, **kw)
    return _m_hat_clover_fast_shard(fc, tmp, params, lat, mesh, sign=-1.0, g5=True, **kw)


def _hop_nd_shard(fg: FastGauge, chi2: jax.Array, p: int, lat: Lattice,
                  mesh, t_axis: str, m_axis: str | None,
                  halfspinor: bool = True, overlap: bool = True) -> jax.Array:
    """Doublet hopping as ONE multi-RHS sharded kernel call (flavor = the R
    axis, r_axis=1): the gauge stream is read once per tile and shared by
    both flavors, and each halo ppermute carries both flavors in a single
    exchange — mirroring the single-chip `_hop_nd` batching on the
    domain-decomposed path."""
    ug = fg.ug_even if p == EVEN else fg.ug_odd
    return dp.hopping_pallas_shard(
        ug, chi2, p, lat, mesh, t_axis=t_axis, m_axis=m_axis,
        interpret=_interpret(), halfspinor=halfspinor, overlap=overlap,
        gcomp=fg.gcomp,
    )


def q_nd_fast_shard(fg: FastGauge, chi2: jax.Array, params, lat: Lattice,
                    mesh, t_axis: str = "t", m_axis: str | None = None) -> jax.Array:
    """Q_nd on the sharded kernel path (reference: Qtm_ndpsi under MPI) —
    flavor-diagonal terms are site-local GSPMD elementwise ops."""
    k2 = jnp.float32(params.kappa * params.kappa)
    tmp = _hop_nd_shard(fg, chi2, EVEN, lat, mesh, t_axis, m_axis)
    tmp = _mee_inv_nd_split(tmp, params.mubar_t, params.epsbar_t, +1.0)
    tmp = _hop_nd_shard(fg, tmp, ODD, lat, mesh, t_axis, m_axis)
    m = _mee_nd_split(chi2, params.mubar_t, params.epsbar_t, +1.0) - k2 * tmp
    return _gamma5_nd(_tau1_split(m))


def q_nd_sq_fast_shard(fg: FastGauge, chi2: jax.Array, params, lat: Lattice,
                       mesh, t_axis: str = "t", m_axis: str | None = None) -> jax.Array:
    return q_nd_fast_shard(
        fg, q_nd_fast_shard(fg, chi2, params, lat, mesh, t_axis, m_axis),
        params, lat, mesh, t_axis, m_axis,
    )


def q_nd_clover_fast_shard(fc: "FastCloverND", chi2: jax.Array, params,
                           lat: Lattice, mesh, t_axis: str = "t",
                           m_axis: str | None = None) -> jax.Array:
    """Q_nd^sw on the sharded kernel path (reference: Qsw_ndpsi under MPI) —
    the NDCLOVERRAT multishift operator on multi-chip."""
    k2 = jnp.float32(params.kappa * params.kappa)
    tmp = _hop_nd_shard(fc.fg, chi2, EVEN, lat, mesh, t_axis, m_axis)
    tmp = _mee_inv_nd_blocks_split(fc, tmp)
    tmp = _hop_nd_shard(fc.fg, tmp, ODD, lat, mesh, t_axis, m_axis)
    m = _mee_nd_blocks_split(fc, chi2) - k2 * tmp
    return _gamma5_nd(_tau1_split(m))


def q_nd_sq_clover_fast_shard(fc: "FastCloverND", chi2: jax.Array, params,
                              lat: Lattice, mesh, t_axis: str = "t",
                              m_axis: str | None = None) -> jax.Array:
    return q_nd_clover_fast_shard(
        fc, q_nd_clover_fast_shard(fc, chi2, params, lat, mesh, t_axis, m_axis),
        params, lat, mesh, t_axis, m_axis,
    )


# ---------------------------------------------------------------------------
# Non-degenerate doublet on the split/Pallas path (reference:
# tm_operators_nd.c's hot loop inside the NDRAT multishift solves)
# ---------------------------------------------------------------------------


def _tau1_split(chi2: jax.Array) -> jax.Array:
    """Flavor swap for split doublets [2(ri), 2(fl), 4, 3, T, X, M]."""
    return chi2[:, ::-1]


def _gamma5_nd(chi2: jax.Array) -> jax.Array:
    sign = jnp.asarray([1.0, 1.0, -1.0, -1.0], chi2.dtype).reshape(
        (1, 1, 4) + (1,) * (chi2.ndim - 3)
    )
    return chi2 * sign


def _i_mul_nd(chi2: jax.Array) -> jax.Array:
    return jnp.stack([-chi2[1], chi2[0]])


def _mee_nd_split(chi2, mubar_t: float, epsbar_t: float, sign: float) -> jax.Array:
    """(1 + i sign mubar g5 tau3 + epsbar tau1) chi in split layout."""
    ig5 = _i_mul_nd(_gamma5_nd(chi2))
    mu = jnp.float32(sign * mubar_t)
    tau3 = jnp.asarray([1.0, -1.0], chi2.dtype).reshape(
        (1, 2) + (1,) * (chi2.ndim - 2)
    )
    return chi2 + mu * tau3 * ig5 + jnp.float32(epsbar_t) * _tau1_split(chi2)


def _mee_inv_nd_split(chi2, mubar_t: float, epsbar_t: float, sign: float) -> jax.Array:
    ig5 = _i_mul_nd(_gamma5_nd(chi2))
    mu = jnp.float32(sign * mubar_t)
    tau3 = jnp.asarray([1.0, -1.0], chi2.dtype).reshape(
        (1, 2) + (1,) * (chi2.ndim - 2)
    )
    inv = jnp.float32(1.0 / (1.0 + mubar_t * mubar_t - epsbar_t * epsbar_t))
    return (chi2 - mu * tau3 * ig5 - jnp.float32(epsbar_t) * _tau1_split(chi2)) * inv


def _hop_nd(fg: FastGauge, chi2: jax.Array, p: int, lat: Lattice) -> jax.Array:
    """Doublet hopping as ONE multi-RHS kernel call (flavor = the R axis,
    r_axis=1): the gauge stream is read once and shared by both flavors —
    the dominant HBM traffic of the NDRAT multishift hot loop drops ~1.4x
    vs two independent per-flavor applications."""
    interp = _interpret()
    ug = fg.ug_even if p == EVEN else fg.ug_odd
    return dp.hopping_pallas_split(ug, chi2, p, lat, interpret=interp,
                                   gcomp=fg.gcomp)


def q_nd_fast(fg: FastGauge, chi2: jax.Array, params, lat: Lattice) -> jax.Array:
    """Q_nd = gamma5 tau1 Mhat_nd on split doublets
    [2(ri), 2(fl), 4, 3, T, X, M] (reference: Qtm_ndpsi)."""
    k2 = jnp.float32(params.kappa * params.kappa)
    tmp = _hop_nd(fg, chi2, EVEN, lat)
    tmp = _mee_inv_nd_split(tmp, params.mubar_t, params.epsbar_t, +1.0)
    tmp = _hop_nd(fg, tmp, ODD, lat)
    m = _mee_nd_split(chi2, params.mubar_t, params.epsbar_t, +1.0) - k2 * tmp
    return _gamma5_nd(_tau1_split(m))


def q_nd_sq_fast(fg: FastGauge, chi2: jax.Array, params, lat: Lattice) -> jax.Array:
    return q_nd_fast(fg, q_nd_fast(fg, chi2, params, lat), params, lat)


# ---------------------------------------------------------------------------
# Twisted-clover on the split/Pallas path (reference: the Qsw_pm hot loop of
# cloverdet solves; sw_invert's pre-inverted blocks)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FastClover:
    """Pre-gathered gauge + materialized clover blocks (split f32):
    moo[sign] = M_oo(+-) blocks, mee_inv[sign] = M_ee(+-)^{-1} blocks,
    each in the FLATTENED kernel layout [2(ri), 72, T, X, M] (row-major
    flatten of [chir, s, sp, c, cp] — dslash_pallas._blk_matvec order) so
    they stream straight into the fused clov_inv/clov_mhat kernel
    epilogues — built once per gauge (reference: sw_term + sw_invert
    refresh discipline)."""

    fg: FastGauge
    moo_p: jax.Array
    moo_m: jax.Array
    mee_inv_p: jax.Array
    mee_inv_m: jax.Array


jax.tree_util.register_dataclass(
    FastClover,
    data_fields=["fg", "moo_p", "moo_m", "mee_inv_p", "mee_inv_m"],
    meta_fields=[],
)


def make_fast_clover(
    u: jax.Array, params: DiracParams, lat: Lattice, sloppy: bool = False
) -> FastClover:
    """sloppy=True stores the gathered links in bfloat16 (the dominant HBM
    stream of Qsw_pm); the clover blocks stay f32 — the low operator of the
    mixed solvers only needs enough accuracy to contract the defect."""
    from tmlqcd_tpu.ops import clover as cl

    sw_e, sw_o = cl.sw_blocks_eo(u, params.kappa, params.c_sw, lat)
    sp = lambda x: _blk_flatten(dp.split_c(x).astype(jnp.float32))
    return FastClover(
        fg=make_fast_gauge(u, params, lat, sloppy=sloppy),
        moo_p=sp(cl.mee_blocks(sw_o, params.mutld, +1.0)),
        moo_m=sp(cl.mee_blocks(sw_o, params.mutld, -1.0)),
        mee_inv_p=sp(cl.mee_inv_blocks(sw_e, params.mutld, +1.0)),
        mee_inv_m=sp(cl.mee_inv_blocks(sw_e, params.mutld, -1.0)),
    )


def _blk_flatten(blk2: jax.Array) -> jax.Array:
    """[2, 2, 2, 2, 3, 3, *site] -> the kernel's [2, 72, *site] layout."""
    return blk2.reshape((2, 72) + blk2.shape[6:])


def _blk_unflatten(blk: jax.Array) -> jax.Array:
    return blk.reshape((2, 2, 2, 2, 3, 3) + blk.shape[2:])


def _blocks_apply_split(blk2: jax.Array, psi2: jax.Array) -> jax.Array:
    """Split-complex chirality-block matvec: blk2 [2,2,2,2,3,3,sites],
    psi2 [2,4,3,sites] -> [2,4,3,sites]."""
    outs_re, outs_im = [], []
    for b, s0 in ((0, 0), (1, 2)):
        for s in range(2):
            for c in range(3):
                acc_re = None
                acc_im = None
                for sp_ in range(2):
                    for cp in range(3):
                        br = blk2[0, b, s, sp_, c, cp]
                        bi = blk2[1, b, s, sp_, c, cp]
                        pr = psi2[0, s0 + sp_, cp]
                        pi = psi2[1, s0 + sp_, cp]
                        tr = br * pr - bi * pi
                        ti = br * pi + bi * pr
                        acc_re = tr if acc_re is None else acc_re + tr
                        acc_im = ti if acc_im is None else acc_im + ti
                outs_re.append(acc_re)
                outs_im.append(acc_im)
    n = len(outs_re)
    re = jnp.stack(outs_re).reshape((4, 3) + psi2.shape[3:])
    im = jnp.stack(outs_im).reshape((4, 3) + psi2.shape[3:])
    return jnp.stack([re, im])


def m_hat_clover_fast(
    fc: FastClover, psi2_o: jax.Array, params: DiracParams, lat: Lattice, sign: float = +1.0
) -> jax.Array:
    """Clover Schur complement on split fields (reference: Msw of
    clovertm_operators.c): M_oo(+-) psi - k^2 H_oe M_ee(+-)^{-1} H_eo psi.

    Both clover-block applications are FUSED into the hopping kernels'
    epilogues (clov_inv / clov_mhat): the reference runs clover_inv and
    clover_gamma5 as separate site loops after Hopping_Matrix — fusing
    saves two full spinor HBM round-trips per Schur application."""
    return _m_hat_clover_fused(fc, psi2_o, params, lat, sign, g5=False)


def _m_hat_clover_fused(
    fc: FastClover, psi2_o: jax.Array, params: DiracParams, lat: Lattice,
    sign: float, g5: bool
) -> jax.Array:
    interp = _interpret()
    k2 = float(params.kappa * params.kappa)
    mee_inv = fc.mee_inv_p if sign > 0 else fc.mee_inv_m
    moo = fc.moo_p if sign > 0 else fc.moo_m
    tmp = dp.hopping_pallas_split(fc.fg.ug_even, psi2_o, EVEN, lat, interpret=interp,
                                  epi=("clov_inv",), blocks=mee_inv,
                                  gcomp=fc.fg.gcomp)
    return dp.hopping_pallas_split(fc.fg.ug_odd, tmp, ODD, lat, interpret=interp,
                                   epi=("clov_mhat", k2, g5), blocks=moo,
                                   psi_o=psi2_o, gcomp=fc.fg.gcomp)


def q_hat_clover_fast(
    fc: FastClover, psi2_o: jax.Array, params: DiracParams, lat: Lattice, sign: float = +1.0
) -> jax.Array:
    return _m_hat_clover_fused(fc, psi2_o, params, lat, sign, g5=True)


def q_hat_pm_clover_fast(
    fc: FastClover, psi2_o: jax.Array, params: DiracParams, lat: Lattice
) -> jax.Array:
    """Qsw_pm on split fields (reference: Qsw_pm_psi)."""
    tmp = q_hat_clover_fast(fc, psi2_o, params, lat, +1.0)
    return q_hat_clover_fast(fc, tmp, params, lat, -1.0)


# ---------------------------------------------------------------------------
# Clover non-degenerate doublet on the split/Pallas path (reference: the
# Qsw_ndpsi hot loop of NDCLOVERRAT multishift solves; sw_invert_nd's
# pre-inverted flavor-2x2 blocks)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FastCloverND:
    """Pre-gathered gauge + materialized ND clover blocks (split f32):
    moo_u/moo_d = flavor-diagonal M_oo(+-mubar) blocks on odd sites;
    (minv_a, minv_b, minv_e) = the flavor-2x2 M_ee^{-1} =
    [[A, -eps E], [-eps E, B]] on even sites — built once per gauge."""

    fg: FastGauge
    moo_u: jax.Array
    moo_d: jax.Array
    minv_a: jax.Array
    minv_b: jax.Array
    minv_e: jax.Array
    epsbar_t: float


jax.tree_util.register_dataclass(
    FastCloverND,
    data_fields=["fg", "moo_u", "moo_d", "minv_a", "minv_b", "minv_e"],
    meta_fields=["epsbar_t"],
)


def _nd_clover_block_tuple(u: jax.Array, params, lat: Lattice):
    """(moo_u, moo_d, minv_a, minv_b, minv_e) split-f32 ND clover blocks —
    the single builder shared by make_fast_clover_nd (solve operator) and
    split_clover_nd_pair (force surrogate) so the eps sign convention and
    block ordering cannot drift apart between the two."""
    from tmlqcd_tpu.ops import clover as cl

    sw_e, sw_o = cl.sw_blocks_eo(u, params.kappa, params.c_sw, lat)
    sp = lambda x: dp.split_c(x).astype(jnp.float32)
    a, b, e = cl.mee_inv_nd_blocks(sw_e, params.mubar_t, params.epsbar_t, +1.0)
    return (
        sp(cl.mee_blocks(sw_o, params.mubar_t, +1.0)),
        sp(cl.mee_blocks(sw_o, params.mubar_t, -1.0)),
        sp(a),
        sp(b),
        sp(e),
    )


def make_fast_clover_nd(u: jax.Array, params, lat: Lattice) -> FastCloverND:
    moo_u, moo_d, minv_a, minv_b, minv_e = _nd_clover_block_tuple(u, params, lat)
    return FastCloverND(
        fg=make_fast_gauge(u, params.wilson, lat),
        moo_u=moo_u,
        moo_d=moo_d,
        minv_a=minv_a,
        minv_b=minv_b,
        minv_e=minv_e,
        epsbar_t=params.epsbar_t,
    )


def _mee_nd_apply_split(moo_u, moo_d, eps, chi2: jax.Array) -> jax.Array:
    """Flavor-2x2 M_oo = [[moo_u, eps], [eps, moo_d]] on raw split blocks."""
    up = _blocks_apply_split(moo_u, chi2[:, 0]) + eps * chi2[:, 1]
    dn = _blocks_apply_split(moo_d, chi2[:, 1]) + eps * chi2[:, 0]
    return jnp.stack([up, dn], axis=1)


def _mee_inv_nd_apply_split(minv_a, minv_b, minv_e, eps, chi2: jax.Array) -> jax.Array:
    """Flavor-2x2 M_ee^{-1} = [[A, -eps E], [-eps E, B]] on raw split blocks."""
    up = _blocks_apply_split(minv_a, chi2[:, 0]) - eps * _blocks_apply_split(
        minv_e, chi2[:, 1]
    )
    dn = _blocks_apply_split(minv_b, chi2[:, 1]) - eps * _blocks_apply_split(
        minv_e, chi2[:, 0]
    )
    return jnp.stack([up, dn], axis=1)


def _mee_nd_blocks_split(fc: FastCloverND, chi2: jax.Array) -> jax.Array:
    return _mee_nd_apply_split(fc.moo_u, fc.moo_d, jnp.float32(fc.epsbar_t), chi2)


def _mee_inv_nd_blocks_split(fc: FastCloverND, chi2: jax.Array) -> jax.Array:
    return _mee_inv_nd_apply_split(
        fc.minv_a, fc.minv_b, fc.minv_e, jnp.float32(fc.epsbar_t), chi2
    )


def q_nd_clover_fast(fc: FastCloverND, chi2: jax.Array, params, lat: Lattice) -> jax.Array:
    """Q_nd^sw = gamma5 tau1 Mhat_nd^sw on split doublets (reference:
    Qsw_ndpsi) — hoppings on the Pallas kernel, clover blocks as
    materialized block matvecs."""
    k2 = jnp.float32(params.kappa * params.kappa)
    tmp = _hop_nd(fc.fg, chi2, EVEN, lat)
    tmp = _mee_inv_nd_blocks_split(fc, tmp)
    tmp = _hop_nd(fc.fg, tmp, ODD, lat)
    m = _mee_nd_blocks_split(fc, chi2) - k2 * tmp
    return _gamma5_nd(_tau1_split(m))


def q_nd_sq_clover_fast(fc: FastCloverND, chi2: jax.Array, params, lat: Lattice) -> jax.Array:
    return q_nd_clover_fast(fc, q_nd_clover_fast(fc, chi2, params, lat), params, lat)


# ---------------------------------------------------------------------------
# Differentiable fast operator for MD forces (reference: deriv_Sb.c — here
# the hopping's custom VJP (dslash_pallas.hopping_diff) makes the whole
# force surrogate run on Pallas kernels, forward and backward)
# ---------------------------------------------------------------------------


def split_gauge_pair(u: jax.Array, params: DiracParams, lat: Lattice):
    """Differentiable (ug_e, ug_o) split-f32 gauge copies as a function of
    the full complex gauge field (jax.grad flows through gauge_copy)."""
    ph = boundary_phases(params, lat)
    ueo = pack_gauge_eo(u, lat)
    ug = dp.gauge_copy(ueo, lat, ph)
    return (
        dp.split_c(ug[EVEN]).astype(jnp.float32),
        dp.split_c(ug[ODD]).astype(jnp.float32),
    )


def q_hat_diff(
    ug_e: jax.Array,
    ug_o: jax.Array,
    psi2_o: jax.Array,
    params: DiracParams,
    lat: Lattice,
    sign: float = +1.0,
) -> jax.Array:
    """Qhat(+-) on split fields with kernel-VJP hoppings — differentiable
    w.r.t. (ug_e, ug_o) AND psi (for force surrogates)."""
    interp = _interpret()
    k2 = jnp.float32(params.kappa * params.kappa)
    tmp = dp.hopping_diff(ug_e, ug_o, psi2_o, EVEN, lat, interp)
    tmp = _mee_inv_split(tmp, params.mutld, sign)
    tmp = dp.hopping_diff(ug_o, ug_e, tmp, ODD, lat, interp)
    return _gamma5(_mee_split(psi2_o, params.mutld, sign) - k2 * tmp)


def dot_re_f64_split(a2: jax.Array, b2: jax.Array) -> jax.Array:
    """Re<a, b> of split arrays = plain f64-accumulated real dot."""
    return jnp.sum(a2.astype(jnp.float64) * b2.astype(jnp.float64))


def q_nd_diff(
    ug_e: jax.Array,
    ug_o: jax.Array,
    chi2: jax.Array,
    params,
    lat: Lattice,
) -> jax.Array:
    """Q_nd on split doublets with kernel-VJP hoppings — differentiable
    w.r.t. (ug_e, ug_o) for the NDRAT force surrogate."""
    interp = _interpret()
    k2 = jnp.float32(params.kappa * params.kappa)

    def hop_diff(c2, p):
        ug_p, ug_q = (ug_e, ug_o) if p == EVEN else (ug_o, ug_e)
        return jnp.stack(
            [
                dp.hopping_diff(ug_p, ug_q, c2[:, 0], p, lat, interp),
                dp.hopping_diff(ug_p, ug_q, c2[:, 1], p, lat, interp),
            ],
            axis=1,
        )

    tmp = hop_diff(chi2, EVEN)
    tmp = _mee_inv_nd_split(tmp, params.mubar_t, params.epsbar_t, +1.0)
    tmp = hop_diff(tmp, ODD)
    m = _mee_nd_split(chi2, params.mubar_t, params.epsbar_t, +1.0) - k2 * tmp
    return _gamma5_nd(_tau1_split(m))


def q_hat_clover_diff(
    ug_e: jax.Array,
    ug_o: jax.Array,
    moo_blk2: jax.Array,
    mee_inv_blk2: jax.Array,
    psi2_o: jax.Array,
    params: DiracParams,
    lat: Lattice,
) -> jax.Array:
    """Qsw(+) on split fields, differentiable w.r.t. (ug_e, ug_o,
    moo_blk2, mee_inv_blk2) — hoppings carry the kernel VJP; the clover
    blocks enter as differentiable inputs so the clover-term force comes
    from jnp AD through sw_blocks/mee_blocks (reference: sw_deriv/sw_all)."""
    interp = _interpret()
    k2 = jnp.float32(params.kappa * params.kappa)
    tmp = dp.hopping_diff(ug_e, ug_o, psi2_o, EVEN, lat, interp)
    tmp = _blocks_apply_split(mee_inv_blk2, tmp)
    tmp = dp.hopping_diff(ug_o, ug_e, tmp, ODD, lat, interp)
    return _gamma5(_blocks_apply_split(moo_blk2, psi2_o) - k2 * tmp)


def split_clover_pair(u: jax.Array, params: DiracParams, lat: Lattice, sign: float = +1.0):
    """Differentiable (ug_e, ug_o, moo_blocks, mee_inv_blocks) split tensors
    as functions of the full gauge field (for clover force surrogates)."""
    from tmlqcd_tpu.ops import clover as cl

    ug_e, ug_o = split_gauge_pair(u, params, lat)
    sw_e, sw_o = cl.sw_blocks_eo(u, params.kappa, params.c_sw, lat)
    sp = lambda x: dp.split_c(x).astype(jnp.float32)
    return (
        ug_e,
        ug_o,
        sp(cl.mee_blocks(sw_o, params.mutld, sign)),
        sp(cl.mee_inv_blocks(sw_e, params.mutld, sign)),
    )


def split_clover_nd_pair(u: jax.Array, params, lat: Lattice):
    """Differentiable (ug_e, ug_o, moo_u, moo_d, minv_a, minv_b, minv_e)
    split tensors as functions of the full gauge field — the non-degenerate
    analog of split_clover_pair, for the NDCLOVERRAT force surrogate
    (reference: sw_deriv_nd + the ndrat derivative in ndrat_monomial.c)."""
    ug_e, ug_o = split_gauge_pair(u, params.wilson, lat)
    return (ug_e, ug_o) + _nd_clover_block_tuple(u, params, lat)


def q_nd_clover_diff(
    ug_e: jax.Array,
    ug_o: jax.Array,
    moo_u: jax.Array,
    moo_d: jax.Array,
    minv_a: jax.Array,
    minv_b: jax.Array,
    minv_e: jax.Array,
    chi2: jax.Array,
    params,
    lat: Lattice,
) -> jax.Array:
    """Q_nd^sw on split doublets, differentiable w.r.t. the gauge copies
    (kernel VJP via dslash_pallas.hopping_diff) AND the materialized clover
    blocks (jnp AD through sw_blocks/mee(_inv)_nd) — the ND analog of
    q_hat_clover_diff, so the NDCLOVERRAT force runs on Pallas kernels
    forward and backward."""
    interp = _interpret()
    k2 = jnp.float32(params.kappa * params.kappa)
    eps = jnp.float32(params.epsbar_t)

    def hop_diff(c2, p):
        ug_p, ug_q = (ug_e, ug_o) if p == EVEN else (ug_o, ug_e)
        return jnp.stack(
            [
                dp.hopping_diff(ug_p, ug_q, c2[:, 0], p, lat, interp),
                dp.hopping_diff(ug_p, ug_q, c2[:, 1], p, lat, interp),
            ],
            axis=1,
        )

    tmp = hop_diff(chi2, EVEN)
    tmp = _mee_inv_nd_apply_split(minv_a, minv_b, minv_e, eps, tmp)
    tmp = hop_diff(tmp, ODD)
    m = _mee_nd_apply_split(moo_u, moo_d, eps, chi2) - k2 * tmp
    return _gamma5_nd(_tau1_split(m))
