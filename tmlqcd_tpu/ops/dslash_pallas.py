"""Pallas TPU dslash — the flagship native kernel.

Reference: operator/Hopping_Matrix.c + halfspinor_hopping.h + the
`_GAUGE_COPY` streaming re-layout (update_backward_gauge.c).  This kernel
replaces the jnp.roll formulation of ops/wilson.dslash_packed on TPU with a
hand-tiled VMEM pipeline (survey §7 M2).

Design (see also tmlqcd_tpu.lattice layout notes):

* SPLIT COMPLEX: Mosaic has no complex dtype; fields move as f32 arrays with
  a LEADING re/im axis: psi [2, 4, 3, T, X, M], gathered gauge
  ug [2, 8, 3, 3, T, X, M].  Splits happen once per solve (solvers iterate
  on the split representation), not per dslash.

* GAUGE COPY: `gauge_copy` pre-gathers, once per gauge update, the link
  actually used by each of the 8 directions at each OUTPUT site — forward
  U_mu(x) on parity p, backward U_mu(x-mu)^+ pulled from parity q — with the
  boundary phases ka_mu folded in.  The kernel then reads exactly
  576 B/site of gauge with zero gathers (the reference's gauge-copy +
  halfspinor NBPointer machinery collapsed into one tensor).

* SPIN ALGEBRA = ADDS: (1 -/+ gamma_mu) = W W^+ with W = (1 -/+ gamma_mu)
  [:, :2] — entries in {0, +-1, +-i} exactly — so projection h = W^+ psi and
  reconstruction out += U h W-weights cost no multiplies (the halfspinor
  factorization of su3spinor.h, derived rather than hand-coded).

* TILING: grid over (T, M/Mt).  Neighbor access: t+-1 via wrapped block
  index maps (two extra thin block reads), x+-1 via in-block jnp.roll
  (X = sublane axis), y/z hops via static slices of a [prev | cur | next]
  m-concat with the even/odd slot masks of lattice.hop_packed computed
  in-kernel from broadcasted_iota.  When Mt == M the m-neighbors wrap
  in-block and only 3 psi blocks are read (HBM traffic ~ 1.2x ideal).

Traffic at Mt == M: 576 (ug) + 3x96 (psi) + 96 (out) = 960 B/site vs the
768 B/site ideal -> 80% of the bandwidth roofline is the design ceiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tmlqcd_tpu.gamma import GAMMA
from tmlqcd_tpu.lattice import Lattice, hop_packed

__all__ = [
    "gauge_copy",
    "split_c",
    "merge_c",
    "hopping_pallas",
    "hopping_pallas_split",
    "hopping_pallas_tshard",
]

# W[mu][fb]: 4x2 halfspinor maps with entries in {0, +-1, +-i}:
#   (1 - gamma_mu) = W_f W_f^+   (forward hop),
#   (1 + gamma_mu) = W_b W_b^+   (backward hop).
_W = []
for _mu in range(4):
    _W.append(
        (
            np.ascontiguousarray((np.eye(4) - GAMMA[_mu])[:, :2]),
            np.ascontiguousarray((np.eye(4) + GAMMA[_mu])[:, :2]),
        )
    )
for _mu in range(4):
    for _fb in range(2):
        _w = _W[_mu][_fb]
        _p = np.eye(4) + (1 if _fb else -1) * GAMMA[_mu]
        assert np.allclose(_w @ _w.conj().T, _p, atol=1e-14)
        assert np.all(np.isin(np.round(_w.real, 12), [-1.0, 0.0, 1.0]))
        assert np.all(np.isin(np.round(_w.imag, 12), [-1.0, 0.0, 1.0]))


def split_c(x: jax.Array) -> jax.Array:
    """complex [..] -> f32/f64 [2, ..] (re, im leading)."""
    return jnp.stack([x.real, x.imag])


def merge_c(x2: jax.Array, dtype=jnp.complex64) -> jax.Array:
    """[2, ..] -> complex."""
    return jax.lax.complex(x2[0], x2[1]).astype(dtype)


def gauge_copy(ueo: jax.Array, lat: Lattice, phases: np.ndarray) -> jax.Array:
    """Pre-gather the per-direction links for BOTH output parities.

    ueo: [2, 3, 3, 4, T, X, M] complex.  Returns ug [2(p), 8, 3, 3, T, X, M]
    complex, direction order d = 2 mu + (0 fwd | 1 bwd), with
      ug[p, 2mu]   = ka_mu * U_mu(x)            (x on parity p)
      ug[p, 2mu+1] = ka_mu^* * U_mu(x-mu)^+     (pulled from parity 1-p)
    (reference: update_backward_gauge.c gauge copy + boundary.c phases).
    """
    out = []
    for p in (0, 1):
        q = 1 - p
        dirs = []
        for mu in range(4):
            ph = np.asarray(phases[mu], np.complex64 if ueo.dtype == jnp.complex64 else np.complex128)[()]
            fwd = ph * ueo[p, :, :, mu]
            ub = hop_packed(ueo[q, :, :, mu], p, mu, -1, lat)
            bwd = np.conj(ph) * jnp.conj(jnp.swapaxes(ub, 0, 1))
            dirs.extend([fwd, bwd])
        out.append(jnp.stack(dirs))
    return jnp.stack(out)  # [2, 8, 3, 3, T, X, M]


def _neighbor(cat, d: int, lat: Lattice, p: int, t_idx, m0, mt: int, cur, tprev, tnext):
    """Neighbor block [2,4,3,X,W] for direction d (2mu + fb) at the output
    sites of this (t, m) tile.  `cat` = [prev-halo | cur | next-halo] concat
    over the last axis with halo width H; slices below are relative to the
    cur window start H."""
    mu, fb = d // 2, d % 2
    dsign = +1 if fb == 0 else -1
    zh = lat.zh
    h = cat.shape[-1] - mt  # total halo width (2H)
    hw = h // 2

    def win(off):
        return jax.lax.slice_in_dim(cat, hw + off, hw + off + mt, axis=-1)

    if mu == 0:
        return tprev if dsign < 0 else tnext
    if mu == 1:
        return jnp.roll(cur, -dsign, axis=-2)
    if mu == 2:
        return win(dsign * zh)
    # mu == 3: slot logic of lattice.hop_packed
    # all-int32 index math: x64 mode must not stage i64 constants (Mosaic
    # lowers them through a recursive lower_fun path that blows the stack)
    xx = jax.lax.broadcasted_iota(jnp.int32, (cur.shape[-2], mt), 0)
    mm = m0 + jax.lax.broadcasted_iota(jnp.int32, (cur.shape[-2], mt), 1)
    y = jax.lax.div(mm, jnp.int32(zh))
    k = mm - y * jnp.int32(zh)
    s1 = jax.lax.rem(t_idx + xx + y + jnp.int32(p), jnp.int32(2)) == 1
    s1 = s1.reshape((1, 1, 1) + s1.shape)
    if dsign > 0:
        edge = jnp.logical_and(s1, (k == zh - 1).reshape((1, 1, 1) + k.shape))
        return jnp.where(edge, win(-(zh - 1)), jnp.where(s1, win(1), cur))
    else:
        s0 = jnp.logical_not(s1)
        edge = jnp.logical_and(s0, (k == 0).reshape((1, 1, 1) + k.shape))
        return jnp.where(edge, win(zh - 1), jnp.where(s0, win(-1), cur))


def _cc(z: complex):
    """complex const -> (re, im) python floats."""
    return float(np.real(z)), float(np.imag(z))


def _wsum(coeffs, vals_re, vals_im):
    """sum_j z_j * v_j for consts z_j in {0,+-1,+-i} and split values —
    emitted as pure adds/negations."""
    acc_re = None
    acc_im = None
    for z, (vr, vi) in zip(coeffs, zip(vals_re, vals_im)):
        zr, zi = _cc(z)
        if zr == 0.0 and zi == 0.0:
            continue
        # z * v = (zr vr - zi vi, zr vi + zi vr) with zr/zi in {0, +-1}
        tr = None
        ti = None
        if zr == 1.0:
            tr, ti = vr, vi
        elif zr == -1.0:
            tr, ti = -vr, -vi
        if zi == 1.0:
            tr = (-vi) if tr is None else tr - vi
            ti = vr if ti is None else ti + vr
        elif zi == -1.0:
            tr = vi if tr is None else tr + vi
            ti = (-vr) if ti is None else ti - vr
        acc_re = tr if acc_re is None else acc_re + tr
        acc_im = ti if acc_im is None else acc_im + ti
    return acc_re, acc_im


def _dslash_kernel(p: int, lat: Lattice, mt: int, nmb: int, scale: float,
                   psi_c_ref, psi_tp_ref, psi_tn_ref, psi_ml_ref, psi_mr_ref,
                   ug_ref, out_ref):
    """One (t, m-tile) block of H_{p,q} psi (all 8 directions fused)."""
    t_idx = pl.program_id(0)
    m_idx = pl.program_id(1)
    m0 = m_idx * mt

    cur = psi_c_ref[:, :, :, 0]  # [2,4,3,X,Mt]
    tprev = psi_tp_ref[:, :, :, 0]
    tnext = psi_tn_ref[:, :, :, 0]
    halo_l = psi_ml_ref[:, :, :, 0]
    halo_r = psi_mr_ref[:, :, :, 0]
    cat = jnp.concatenate([halo_l, cur, halo_r], axis=-1)

    x_ext = cur.shape[-2]
    acc_re = [[None] * 3 for _ in range(4)]
    acc_im = [[None] * 3 for _ in range(4)]

    for d in range(8):
        mu, fb = d // 2, d % 2
        w = _W[mu][fb]  # [4, 2], entries {0,+-1,+-i}
        nbr = _neighbor(cat, d, lat, p, t_idx, m0, mt, cur, tprev, tnext)
        # h[a][c] = sum_s conj(w[s,a]) nbr[s,c]   (adds only)
        h_re = [[None] * 3 for _ in range(2)]
        h_im = [[None] * 3 for _ in range(2)]
        for a in range(2):
            coeffs = [np.conj(w[s, a]) for s in range(4)]
            for c in range(3):
                vr = [nbr[0, s, c] for s in range(4)]
                vi = [nbr[1, s, c] for s in range(4)]
                h_re[a][c], h_im[a][c] = _wsum(coeffs, vr, vi)
        # uh[a][i] = sum_j ug[d,i,j] h[a][j]   (complex mults, the flops)
        uh_re = [[None] * 3 for _ in range(2)]
        uh_im = [[None] * 3 for _ in range(2)]
        for i in range(3):
            for j in range(3):
                # bf16 gauge (sloppy/mixed-precision mode) upcasts in VMEM:
                # halves the dominant HBM stream (576 -> 288 B/site)
                gr = ug_ref[0, d, i, j, 0].astype(jnp.float32)
                gi = ug_ref[1, d, i, j, 0].astype(jnp.float32)
                for a in range(2):
                    tr = gr * h_re[a][j] - gi * h_im[a][j]
                    ti = gr * h_im[a][j] + gi * h_re[a][j]
                    if uh_re[a][i] is None:
                        uh_re[a][i], uh_im[a][i] = tr, ti
                    else:
                        uh_re[a][i] += tr
                        uh_im[a][i] += ti
        # out[s][c] += sum_a w[s,a] uh[a][c]   (adds only)
        for s in range(4):
            coeffs = [w[s, a] for a in range(2)]
            for c in range(3):
                vr = [uh_re[a][c] for a in range(2)]
                vi = [uh_im[a][c] for a in range(2)]
                tr, ti = _wsum(coeffs, vr, vi)
                if tr is None:
                    continue
                if acc_re[s][c] is None:
                    acc_re[s][c], acc_im[s][c] = tr, ti
                else:
                    acc_re[s][c] += tr
                    acc_im[s][c] += ti

    if scale != 1.0:
        sc = jnp.float32(scale)
        for s_ in range(4):
            for c_ in range(3):
                if acc_re[s_][c_] is not None:
                    acc_re[s_][c_] = acc_re[s_][c_] * sc
                    acc_im[s_][c_] = acc_im[s_][c_] * sc
    zero = jnp.zeros((x_ext, mt), jnp.float32)
    out = jnp.stack(
        [
            jnp.stack([jnp.stack([acc_re[s][c] if acc_re[s][c] is not None else zero
                                  for c in range(3)]) for s in range(4)]),
            jnp.stack([jnp.stack([acc_im[s][c] if acc_im[s][c] is not None else zero
                                  for c in range(3)]) for s in range(4)]),
        ]
    )
    out_ref[:, :, :, 0] = out


def _pick_tiles(lat: Lattice, vmem_budget: int) -> tuple[int, int]:
    """(mt, hw): m-tile width and halo width.

    Mosaic requires the lane (last) block dim to be a multiple of 128 or the
    full axis, so: small/odd M -> single tile with full-axis halos; else mt
    runs over 128-multiples dividing M (largest fitting the VMEM budget) and
    hw = 128*ceil(zh/128)."""
    m, zh, x = lat.m, lat.zh, lat.dims[1]

    def fits(mt, hw):
        per_site = (3 * 24 + 144 + 24) * 4  # psi(3) + ug + out, f32
        work = per_site * x * mt + 24 * 4 * x * 2 * hw
        return 2 * work <= vmem_budget

    if m % 128 != 0 or m < 256:
        return m, m
    hw = 128 * ((zh + 127) // 128)
    cands = [w for w in range(m, 127, -128) if m % w == 0 and w % hw == 0 and w >= hw]
    for mt in cands:
        if fits(mt, hw):
            return mt, hw
    return (cands[-1], hw) if cands else (m, m)


@functools.lru_cache(maxsize=32)
def _build(p: int, lat: Lattice, mt: int, hw: int, scale: float, interpret: bool):
    t_ext, x_ext = lat.dims[0], lat.dims[1]
    m = lat.m
    nmb = m // mt
    assert mt % hw == 0 and m % mt == 0 and hw >= min(lat.zh, mt)

    r = mt // hw  # halo blocks per tile

    psi_block = (2, 4, 3, 1, x_ext, mt)
    halo_block = (2, 4, 3, 1, x_ext, hw)
    ug_block = (2, 8, 3, 3, 1, x_ext, mt)

    def _mod(a, n: int):
        # pure-int32 modulus: under x64, `a % python_int` promotes to i64,
        # whose Mosaic convert fallback recurses infinitely in the
        # index-map transform lowering. `a` is a non-negative block index
        # (offsets below keep it >= 0), so trunc-rem == mod.
        return jax.lax.rem(a, jnp.int32(n))

    nh = nmb * r  # halo blocks along m
    # NB: a literal 0 in an index map stages an i64 constant under x64
    # (Mosaic rejects mixed i64/i32 index tuples), and index maps must not
    # capture traced constants — so derive an i32 zero from the args.
    specs = [
        pl.BlockSpec(psi_block, lambda t, j: (t - t, t - t, t - t, t, t - t, j)),
        pl.BlockSpec(
            psi_block,
            lambda t, j: (t - t, t - t, t - t, _mod(t + (t_ext - 1), t_ext), t - t, j),
        ),
        pl.BlockSpec(
            psi_block, lambda t, j: (t - t, t - t, t - t, _mod(t + 1, t_ext), t - t, j)
        ),
        # m-halos in units of the halo block (thin reads)
        pl.BlockSpec(
            halo_block,
            lambda t, j: (t - t, t - t, t - t, t, t - t, _mod(j * r + (nh - 1), nh)),
        ),
        pl.BlockSpec(
            halo_block,
            lambda t, j: (t - t, t - t, t - t, t, t - t, _mod((j + 1) * r, nh)),
        ),
        pl.BlockSpec(
            ug_block, lambda t, j: (t - t, t - t, t - t, t - t, t, t - t, j)
        ),
    ]
    out_spec = pl.BlockSpec(psi_block, lambda t, j: (t - t, t - t, t - t, t, t - t, j))

    flops_site = 1320
    sites = lat.volume // 2
    cost = pl.CostEstimate(
        flops=flops_site * sites,
        bytes_accessed=(576 + 3 * 96 + 96) * sites,
        transcendentals=0,
    )

    kernel = functools.partial(_dslash_kernel, p, lat, mt, nmb, scale)
    return pl.pallas_call(
        kernel,
        grid=(t_ext, nmb),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, 4, 3, t_ext, x_ext, m), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )


def hopping_pallas_split(
    ug_p: jax.Array,
    psi_q: jax.Array,
    p: int,
    lat: Lattice,
    mt: int | None = None,
    interpret: bool = False,
    scale: float = 1.0,
) -> jax.Array:
    """(scale * H_{p,q}) psi_q on split-f32 fields.

    ug_p: [2, 8, 3, 3, T, X, M] f32 — gauge_copy()[p] split;
    psi_q: [2, 4, 3, T, X, M] f32.  Returns the same split layout.
    `scale` is a STATIC constant fused into the kernel epilogue — e.g.
    -kappa for operators, or a normalization in back-to-back benchmarks —
    avoiding a separate elementwise HBM pass (+192 B/site).
    """
    import os

    # ~16 MB usable VMEM on TPU v5e (measured: mt=128 fits, 256 OOMs at
    # 32x32x32x64); override with TMLQCD_TPU_VMEM_MB on parts with more.
    budget = int(os.environ.get("TMLQCD_TPU_VMEM_MB", "14")) * 2**20
    mt_auto, hw = _pick_tiles(lat, vmem_budget=budget)
    if mt is None:
        mt = mt_auto
    if mt == lat.m and (lat.m % 128 != 0 or lat.m < 256):
        hw = lat.m
    call = _build(p, lat, int(mt), int(hw), float(scale), interpret)
    return call(psi_q, psi_q, psi_q, psi_q, psi_q, ug_p)


def hopping_pallas(
    ug: jax.Array,
    psi_q: jax.Array,
    p: int,
    lat: Lattice,
    mt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in complex wrapper: ug = gauge_copy(...) complex [2,8,3,3,T,X,M],
    psi_q complex [4,3,T,X,M] -> complex.  (For hot loops prefer the split
    API — the complex<->split conversion costs one extra HBM pass.)"""
    out = hopping_pallas_split(
        split_c(ug[p]).astype(jnp.float32),
        split_c(psi_q).astype(jnp.float32),
        p,
        lat,
        mt=mt,
        interpret=interpret,
    )
    return merge_c(out, psi_q.dtype)


# ---------------------------------------------------------------------------
# Multi-chip: t-sharded kernel under shard_map (reference: the MPI domain
# decomposition + xchange_field halo exchange, survey §2.3 — here two thin
# ppermute collectives glue the t-halos and each shard runs the same Mosaic
# kernel on its local slab)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _build_ext(p: int, lat_loc: Lattice, mt: int, hw: int, scale: float, interpret: bool):
    """Kernel over a LOCAL t-slab with explicit t-halos: psi_ext has
    T_loc + 2 slices ([halo_lo | local | halo_hi]); no t-wrap in the index
    maps (the halos came from the neighbor shards via ppermute)."""
    t_loc, x_ext = lat_loc.dims[0], lat_loc.dims[1]
    m = lat_loc.m
    nmb = m // mt
    assert mt % hw == 0 and m % mt == 0 and hw >= min(lat_loc.zh, mt)
    r = mt // hw
    nh = nmb * r

    psi_block = (2, 4, 3, 1, x_ext, mt)
    halo_block = (2, 4, 3, 1, x_ext, hw)
    ug_block = (2, 8, 3, 3, 1, x_ext, mt)

    def _mod(a, n: int):
        return jax.lax.rem(a, jnp.int32(n))

    specs = [
        pl.BlockSpec(psi_block, lambda t, j: (t - t, t - t, t - t, t + 1, t - t, j)),
        pl.BlockSpec(psi_block, lambda t, j: (t - t, t - t, t - t, t, t - t, j)),
        pl.BlockSpec(psi_block, lambda t, j: (t - t, t - t, t - t, t + 2, t - t, j)),
        pl.BlockSpec(
            halo_block,
            lambda t, j: (t - t, t - t, t - t, t + 1, t - t, _mod(j * r + (nh - 1), nh)),
        ),
        pl.BlockSpec(
            halo_block,
            lambda t, j: (t - t, t - t, t - t, t + 1, t - t, _mod((j + 1) * r, nh)),
        ),
        pl.BlockSpec(ug_block, lambda t, j: (t - t, t - t, t - t, t - t, t, t - t, j)),
    ]
    out_spec = pl.BlockSpec(psi_block, lambda t, j: (t - t, t - t, t - t, t, t - t, j))

    kernel = functools.partial(_dslash_kernel, p, lat_loc, mt, nmb, scale)
    return pl.pallas_call(
        kernel,
        grid=(t_loc, nmb),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, 4, 3, t_loc, x_ext, m), jnp.float32),
        interpret=interpret,
    )


def _spin_map_split(mat: np.ndarray, psi2: jax.Array) -> jax.Array:
    """Apply a constant spin matrix (complex [s_out, s_in]) to a split
    field [2, s_in, 3, ...] -> [2, s_out, 3, ...]."""
    wr = jnp.asarray(mat.real, psi2.dtype)
    wi = jnp.asarray(mat.imag, psi2.dtype)
    re = jnp.einsum("ab,b...->a...", wr, psi2[0]) - jnp.einsum(
        "ab,b...->a...", wi, psi2[1]
    )
    im = jnp.einsum("ab,b...->a...", wr, psi2[1]) + jnp.einsum(
        "ab,b...->a...", wi, psi2[0]
    )
    return jnp.stack([re, im])


def hopping_pallas_tshard(
    ug_p: jax.Array,
    psi_q: jax.Array,
    p: int,
    lat: Lattice,
    mesh,
    axis: str = "t",
    mt: int | None = None,
    interpret: bool = False,
    scale: float = 1.0,
    halfspinor: bool = True,
) -> jax.Array:
    """Sharded H_{p,q}: the t axis distributed over `mesh[axis]`; halo
    exchange = two slice-ppermutes per application (the xchange_field
    analog), compute = the local Mosaic kernel per shard.

    halfspinor=True (default) exchanges spin-PROJECTED 2-spinor halos —
    half the ICI bytes (reference: --enable-halfspinor / xchange_halffield).
    Lossless for the kernel: a halo slice is only ever consumed as the
    t-neighbor through W_d^+, and with W_d^+ W_d = 2 the reconstruction
    0.5 W_d s on the receiver satisfies W_d^+ (0.5 W_d s) = s exactly
    (halo_lo is read as t-prev => W = (1+gamma_0) isometry; halo_hi as
    t-next => (1-gamma_0)).

    Shard-count parity: T_loc must be EVEN so the in-kernel (t+x+y+p)
    parity masks coincide with the global ones (asserted).
    """
    import os

    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map
    tsh = int(mesh.shape[axis])
    t_glob = lat.dims[0]
    if t_glob % tsh or (t_glob // tsh) % 2:
        raise ValueError(f"T={t_glob} must split into even slabs over {tsh} shards")
    lat_loc = Lattice((t_glob // tsh,) + tuple(lat.dims[1:]))

    budget = int(os.environ.get("TMLQCD_TPU_VMEM_MB", "14")) * 2**20
    mt_auto, hw = _pick_tiles(lat_loc, vmem_budget=budget)
    if mt is None:
        mt = mt_auto
    if mt == lat_loc.m and (lat_loc.m % 128 != 0 or lat_loc.m < 256):
        hw = lat_loc.m
    call = _build_ext(p, lat_loc, int(mt), int(hw), float(scale), interpret)

    fwd = [(i, (i + 1) % tsh) for i in range(tsh)]
    bwd = [(i, (i - 1) % tsh) for i in range(tsh)]

    wf_, wb_ = _W[0]  # (1 -+ gamma_0) 4x2 isometries

    def local_fn(ug_l, psi_l):
        if halfspinor:
            s_lo = jax.lax.ppermute(
                _spin_map_split(wb_.conj().T, psi_l[:, :, :, -1:]), axis, fwd
            )
            s_hi = jax.lax.ppermute(
                _spin_map_split(wf_.conj().T, psi_l[:, :, :, :1]), axis, bwd
            )
            halo_lo = _spin_map_split(0.5 * wb_, s_lo)
            halo_hi = _spin_map_split(0.5 * wf_, s_hi)
        else:
            halo_lo = jax.lax.ppermute(psi_l[:, :, :, -1:], axis, fwd)
            halo_hi = jax.lax.ppermute(psi_l[:, :, :, :1], axis, bwd)
        ext = jnp.concatenate([halo_lo, psi_l, halo_hi], axis=3)
        return call(ext, ext, ext, ext, ext, ug_l)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, None, None, None, axis, None, None),
            P(None, None, None, axis, None, None),
        ),
        out_specs=P(None, None, None, axis, None, None),
        # pallas_call out_shapes carry no varying-mesh-axes annotation
        check_vma=False,
    )(ug_p, psi_q)


# ---------------------------------------------------------------------------
# Force kernel + differentiable hopping (reference: deriv_Sb.c — the fermion
# force outer product, "structurally the dslash adjoint", survey §2.7)
# ---------------------------------------------------------------------------


def _ug_vjp_kernel(p: int, lat: Lattice, mt: int, nmb: int,
                   g_ref, psi_c_ref, psi_tp_ref, psi_tn_ref, psi_ml_ref,
                   psi_mr_ref, out_ref):
    """d(Re<g, H psi>)/d(ug[p]) for one (t, m) tile: per direction the
    deriv_Sb outer product F[i,j] = sum_a ghat[a,i] conj(h[a,j]) with
    ghat = W^+ g (projection of the cotangent) and h = W^+ psi_neighbor
    (the same projected halfspinor as the forward kernel)."""
    t_idx = pl.program_id(0)
    m_idx = pl.program_id(1)
    m0 = m_idx * mt

    g = g_ref[:, :, :, 0]
    cur = psi_c_ref[:, :, :, 0]
    tprev = psi_tp_ref[:, :, :, 0]
    tnext = psi_tn_ref[:, :, :, 0]
    halo_l = psi_ml_ref[:, :, :, 0]
    halo_r = psi_mr_ref[:, :, :, 0]
    cat = jnp.concatenate([halo_l, cur, halo_r], axis=-1)

    for d in range(8):
        mu, fb = d // 2, d % 2
        w = _W[mu][fb]
        nbr = _neighbor(cat, d, lat, p, t_idx, m0, mt, cur, tprev, tnext)
        # projections (adds only): ghat[a][i], h[a][j]
        gh_re = [[None] * 3 for _ in range(2)]
        gh_im = [[None] * 3 for _ in range(2)]
        h_re = [[None] * 3 for _ in range(2)]
        h_im = [[None] * 3 for _ in range(2)]
        for a in range(2):
            coeffs = [np.conj(w[s, a]) for s in range(4)]
            for c in range(3):
                gh_re[a][c], gh_im[a][c] = _wsum(
                    coeffs, [g[0, s, c] for s in range(4)], [g[1, s, c] for s in range(4)]
                )
                h_re[a][c], h_im[a][c] = _wsum(
                    coeffs, [nbr[0, s, c] for s in range(4)], [nbr[1, s, c] for s in range(4)]
                )
        # F[i,j] = sum_a ghat[a,i] * conj(h[a,j]) -> (Re F, Im F)
        for i in range(3):
            for j in range(3):
                fr = None
                fi = None
                for a in range(2):
                    tr = gh_re[a][i] * h_re[a][j] + gh_im[a][i] * h_im[a][j]
                    ti = gh_im[a][i] * h_re[a][j] - gh_re[a][i] * h_im[a][j]
                    fr = tr if fr is None else fr + tr
                    fi = ti if fi is None else fi + ti
                out_ref[0, d, i, j, 0] = fr
                out_ref[1, d, i, j, 0] = fi


@functools.lru_cache(maxsize=32)
def _build_ug_vjp(p: int, lat: Lattice, mt: int, hw: int, interpret: bool):
    t_ext, x_ext = lat.dims[0], lat.dims[1]
    m = lat.m
    nmb = m // mt
    r = mt // hw
    nh = nmb * r

    psi_block = (2, 4, 3, 1, x_ext, mt)
    halo_block = (2, 4, 3, 1, x_ext, hw)
    ug_block = (2, 8, 3, 3, 1, x_ext, mt)

    def _mod(a, n: int):
        return jax.lax.rem(a, jnp.int32(n))

    specs = [
        pl.BlockSpec(psi_block, lambda t, j: (t - t, t - t, t - t, t, t - t, j)),
        pl.BlockSpec(psi_block, lambda t, j: (t - t, t - t, t - t, t, t - t, j)),
        pl.BlockSpec(
            psi_block,
            lambda t, j: (t - t, t - t, t - t, _mod(t + (t_ext - 1), t_ext), t - t, j),
        ),
        pl.BlockSpec(
            psi_block, lambda t, j: (t - t, t - t, t - t, _mod(t + 1, t_ext), t - t, j)
        ),
        pl.BlockSpec(
            halo_block,
            lambda t, j: (t - t, t - t, t - t, t, t - t, _mod(j * r + (nh - 1), nh)),
        ),
        pl.BlockSpec(
            halo_block,
            lambda t, j: (t - t, t - t, t - t, t, t - t, _mod((j + 1) * r, nh)),
        ),
    ]
    out_spec = pl.BlockSpec(
        ug_block, lambda t, j: (t - t, t - t, t - t, t - t, t, t - t, j)
    )
    kernel = functools.partial(_ug_vjp_kernel, p, lat, mt, nmb)
    return pl.pallas_call(
        kernel,
        grid=(t_ext, nmb),
        in_specs=specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, 8, 3, 3, t_ext, x_ext, m), jnp.float32),
        interpret=interpret,
    )


def _tiles_for(lat: Lattice):
    import os

    budget = int(os.environ.get("TMLQCD_TPU_VMEM_MB", "14")) * 2**20
    mt, hw = _pick_tiles(lat, vmem_budget=budget)
    if mt == lat.m and (lat.m % 128 != 0 or lat.m < 256):
        hw = lat.m
    return mt, hw


def hopping_ug_vjp(
    g2: jax.Array, psi_q: jax.Array, p: int, lat: Lattice, interpret: bool = False
) -> jax.Array:
    """dug[p] of Re<g, H_{p,q}(ug) psi> at fixed (g, psi) — the deriv_Sb
    outer-product kernel. Returns split f32 [2, 8, 3, 3, T, X, M]."""
    mt, hw = _tiles_for(lat)
    call = _build_ug_vjp(p, lat, int(mt), int(hw), interpret)
    return call(g2, psi_q, psi_q, psi_q, psi_q, psi_q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def hopping_diff(ug_p, ug_q, psi_q, p: int, lat: Lattice, interpret: bool = False):
    """Differentiable Pallas hopping: forward = H_{p,q}(ug_p) psi; backward
    gives d/d(ug_p) via the outer-product kernel and d/dpsi via the adjoint
    identity H^+ = g5 H_{q,p} g5 (verified numerically) using ug_q.
    All arrays split f32.  (ug_q receives a zero cotangent — it only
    parameterizes the adjoint application.)"""
    return hopping_pallas_split(ug_p, psi_q, p, lat, interpret=interpret)


def _hopping_diff_fwd(ug_p, ug_q, psi_q, p, lat, interpret):
    out = hopping_pallas_split(ug_p, psi_q, p, lat, interpret=interpret)
    return out, (ug_q, psi_q)


def _g5_split(x2):
    sign = jnp.asarray([1.0, 1.0, -1.0, -1.0], x2.dtype).reshape(
        (1, 4) + (1,) * (x2.ndim - 2)
    )
    return x2 * sign


def _hopping_diff_bwd(p, lat, interpret, res, g2):
    ug_q, psi_q = res
    q = 1 - p
    dug = hopping_ug_vjp(g2, psi_q, p, lat, interpret=interpret)
    # dpsi = H^+ g = g5 H_{q,p} g5 g
    dpsi = _g5_split(
        hopping_pallas_split(ug_q, _g5_split(g2), q, lat, interpret=interpret)
    )
    return dug, jnp.zeros_like(ug_q), dpsi


hopping_diff.defvjp(_hopping_diff_fwd, _hopping_diff_bwd)
