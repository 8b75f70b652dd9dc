"""Lattice geometry: dimensions, even/odd packing, neighbor shifts.

TPU-native replacement for the reference's index-map machinery
(reference: geometry_eo.c `geometry`, `g_ipt`/`g_iup`/`g_idn`,
`g_lexic2eosub`; init/init_geometry_indices.c).  The reference precomputes
explicit neighbor index tables including halo ("rand") sites; here geometry is
*structural*: neighbor access is rolls + static masked selects, which XLA's
SPMD partitioner lowers to collective-permutes over the device mesh when the
rolled axes are sharded — the halo exchange of xchange/xchange_field.c with
zero hand-written communication code.

FIELD LAYOUT — the central TPU design decision (survey §7 "hard parts"):
TPU memory is tiled (sublane x lane) = (8 x 128) for f32; the *minor-most*
array dims get padded to those tiles.  Tiny trailing color/spin dims
(3, 3) would be padded 8x128/9 ~ 57x (measured: a 288 MB gauge field ballooned
to 16 GB).  Therefore all fields are structure-of-arrays:

    spin/color dims LEADING, lattice site dims TRAILING,
    with the last two site dims flattened so the lane dim is large:

    spinor  (packed e/o): [4 spin, 3 color, T, X, M]    M  = Y * Z/2
    spinor  (full)      : [4, 3, T, X, Mf]              Mf = Y * Z
    gauge   (full)      : [3, 3, 4 mu, T, X, Mf]
    gauge   (packed)    : [2 parity, 3, 3, 4, T, X, M]
    momenta/forces      : [3, 3, 4, T, X, Mf]

With M a multiple of 128 (any production lattice) there is zero padding and
every elementwise/stencil op vectorizes sites onto the full VPU lane width.
SU(3) "matrices" are 9 site-arrays; the 3x3 multiply is 9 fused
multiply-accumulates over lanes — the TPU analog of the reference's SSE
macro bodies (su3.h), with the vector axis being *sites* instead of a
hand-chosen SIMD width.

Even/odd packing (reference: even sites [0, VOLUME/2), odd [VOLUME/2, VOLUME)):
site parity p = (t+x+y+z) % 2; a parity-p field stores, at flat site
m = y*(Z/2) + k, the value at z = 2k + s with slot s = (t+x+y+p) % 2.
Shifts in t/x/y map parity p <-> 1-p at the SAME k (plain rolls: axis rolls
for t/x, a roll by Z/2 on the flat axis for y — exact because the flat index
wraps modulo Y*Z/2); shifts in z select between k and k+-1 with a wrap *within
the y-block*, implemented as two rolls + static masks (see hop_packed).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = [
    "Lattice",
    "EVEN",
    "ODD",
    "shift_full",
    "hop_packed",
    "eo_pack",
    "eo_unpack",
    "pack_gauge_eo",
]

EVEN = 0
ODD = 1

# site axes are always the LAST THREE: (T, X, M)
_AXT, _AXX, _AXM = -3, -2, -1


@dataclasses.dataclass(frozen=True)
class Lattice:
    """Static lattice metadata. Hashable, usable as a jit-static argument.

    dims = (T, X, Y, Z); Z must be even (e/o packing halves it).
    """

    dims: tuple[int, int, int, int]

    def __post_init__(self):
        if len(self.dims) != 4:
            raise ValueError(f"dims must be (T,X,Y,Z), got {self.dims}")
        if self.dims[3] % 2 != 0:
            raise ValueError("Z extent must be even for even/odd packing")

    @property
    def volume(self) -> int:
        return int(np.prod(self.dims))

    @property
    def zh(self) -> int:
        return self.dims[3] // 2

    @property
    def mf(self) -> int:
        """Flattened (Y, Z) extent of full-lattice fields."""
        return self.dims[2] * self.dims[3]

    @property
    def m(self) -> int:
        """Flattened (Y, Z/2) extent of e/o-packed fields."""
        return self.dims[2] * self.zh

    @property
    def site_shape(self) -> tuple[int, int, int]:
        """Trailing site axes of full-lattice fields: (T, X, Y*Z)."""
        return (self.dims[0], self.dims[1], self.mf)

    @property
    def eo_site_shape(self) -> tuple[int, int, int]:
        """Trailing site axes of packed fields: (T, X, Y*Z/2)."""
        return (self.dims[0], self.dims[1], self.m)


# ---------------------------------------------------------------------------
# static masks (numpy, computed once per (lattice, parity) — trace-time consts)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _slot_mask(lat: Lattice, p: int) -> np.ndarray:
    """[T, X, M] bool: slot s = (t+x+y+p) % 2 == 1 at each packed site."""
    t, x, y, _ = lat.dims
    tt = np.arange(t)[:, None, None]
    xx = np.arange(x)[None, :, None]
    yy = np.repeat(np.arange(y), lat.zh)[None, None, :]
    return ((tt + xx + yy + p) % 2 == 1)


@lru_cache(maxsize=None)
def _k_edge_mask(lat: Lattice, last: bool) -> np.ndarray:
    """[M] bool: k == Z/2-1 (last) or k == 0 (first) within each y-block."""
    k = np.tile(np.arange(lat.zh), lat.dims[2])
    return (k == (lat.zh - 1)) if last else (k == 0)


@lru_cache(maxsize=None)
def _z_edge_mask_full(lat: Lattice, last: bool) -> np.ndarray:
    """[Mf] bool: z == Z-1 (last) or z == 0 (first) within each y-block."""
    z = np.tile(np.arange(lat.dims[3]), lat.dims[2])
    return (z == (lat.dims[3] - 1)) if last else (z == 0)


@lru_cache(maxsize=None)
def _txy_parity_mask(lat: Lattice) -> np.ndarray:
    """[T, X, Y, 1] bool: (t+x+y) % 2 == 1 (for eo_pack slot selection)."""
    t, x, y, _ = lat.dims
    tt = np.arange(t)[:, None, None]
    xx = np.arange(x)[None, :, None]
    yy = np.arange(y)[None, None, :]
    return (((tt + xx + yy) % 2) == 1)[..., None]


# ---------------------------------------------------------------------------
# shifts
# ---------------------------------------------------------------------------


def shift_full(f: jnp.ndarray, mu: int, d: int, lat: Lattice) -> jnp.ndarray:
    """Value at x + d*mu_hat for a full-lattice field [..., T, X, Y*Z],
    periodic wrap.  d=+1 reads the forward neighbor."""
    if mu == 0:
        return jnp.roll(f, -d, axis=_AXT)
    if mu == 1:
        return jnp.roll(f, -d, axis=_AXX)
    if mu == 2:
        # y-shift: exact on the flat axis (wrap mod Y*Z lands correctly)
        return jnp.roll(f, -d * lat.dims[3], axis=_AXM)
    # z-shift: wrap within each y-block of length Z
    z = lat.dims[3]
    if d == +1:
        base = jnp.roll(f, -1, axis=_AXM)
        fix = jnp.roll(f, z - 1, axis=_AXM)
        return jnp.where(jnp.asarray(_z_edge_mask_full(lat, last=True)), fix, base)
    else:
        base = jnp.roll(f, 1, axis=_AXM)
        fix = jnp.roll(f, -(z - 1), axis=_AXM)
        return jnp.where(jnp.asarray(_z_edge_mask_full(lat, last=False)), fix, base)


def hop_packed(f_q: jnp.ndarray, p: int, mu: int, d: int, lat: Lattice) -> jnp.ndarray:
    """Neighbor gather on packed fields [..., T, X, Y*Z/2]: for each parity-p
    site x, the value of the parity-(1-p) field `f_q` at x + d*mu_hat.

    Packed-layout analog of the reference's g_iup/g_idn neighbor tables plus
    the spinor halo exchange (xchange_field.c): rolls on sharded axes become
    XLA collective-permutes.
    """
    if mu == 0:
        return jnp.roll(f_q, -d, axis=_AXT)
    if mu == 1:
        return jnp.roll(f_q, -d, axis=_AXX)
    if mu == 2:
        return jnp.roll(f_q, -d * lat.zh, axis=_AXM)
    # z-hop with e/o slot logic: slot s = (t+x+y+p) % 2 of the *destination*
    # parity-p site decides whether the neighbor sits at the same k or k+-1.
    s1 = jnp.asarray(_slot_mask(lat, p))  # [T, X, M], broadcasts from the right
    zh = lat.zh
    if d == +1:
        # s=0 -> same k ; s=1 -> k+1 (wrapping within the y-block)
        base = jnp.where(s1, jnp.roll(f_q, -1, axis=_AXM), f_q)
        edge = jnp.asarray(_slot_mask(lat, p) & _k_edge_mask(lat, last=True))
        return jnp.where(edge, jnp.roll(f_q, zh - 1, axis=_AXM), base)
    else:
        # s=1 -> same k ; s=0 -> k-1 (wrapping within the y-block)
        s0 = jnp.asarray(~_slot_mask(lat, p))
        base = jnp.where(s0, jnp.roll(f_q, 1, axis=_AXM), f_q)
        edge = jnp.asarray((~_slot_mask(lat, p)) & _k_edge_mask(lat, last=False))
        return jnp.where(edge, jnp.roll(f_q, -(zh - 1), axis=_AXM), base)


# ---------------------------------------------------------------------------
# even/odd packing
# ---------------------------------------------------------------------------


def eo_pack(f: jnp.ndarray, lat: Lattice):
    """Split a full-lattice field [..., T, X, Y*Z] into (even, odd) packed
    fields [..., T, X, Y*Z/2].

    even[..., m=y*Z/2+k] = f[..., y*Z + 2k + s0],  s0 = (t+x+y) % 2
    odd [..., m]         = f[..., y*Z + 2k + 1-s0]
    """
    t, x, y, z = lat.dims
    pairs = f.reshape(f.shape[:-3] + (t, x, y, lat.zh, 2))
    slot0 = pairs[..., 0]
    slot1 = pairs[..., 1]
    m = jnp.asarray(_txy_parity_mask(lat))  # [T,X,Y,1]
    even = jnp.where(m, slot1, slot0)
    odd = jnp.where(m, slot0, slot1)
    newshape = f.shape[:-3] + (t, x, lat.m)
    return even.reshape(newshape), odd.reshape(newshape)


def eo_unpack(even: jnp.ndarray, odd: jnp.ndarray, lat: Lattice) -> jnp.ndarray:
    """Inverse of :func:`eo_pack`."""
    t, x, y, z = lat.dims
    e = even.reshape(even.shape[:-3] + (t, x, y, lat.zh))
    o = odd.reshape(odd.shape[:-3] + (t, x, y, lat.zh))
    m = jnp.asarray(_txy_parity_mask(lat))
    slot0 = jnp.where(m, o, e)
    slot1 = jnp.where(m, e, o)
    pairs = jnp.stack([slot0, slot1], axis=-1)
    return pairs.reshape(even.shape[:-3] + (t, x, lat.mf))


def pack_gauge_eo(u: jnp.ndarray, lat: Lattice) -> jnp.ndarray:
    """Pack a full gauge field [3, 3, 4, T, X, Y*Z] into per-parity links
    [2, 3, 3, 4, T, X, Y*Z/2] (reference: the e/o view of
    update_backward_gauge.c's gauge-copy re-layouts)."""
    even, odd = eo_pack(u, lat)
    return jnp.stack([even, odd], axis=0)
