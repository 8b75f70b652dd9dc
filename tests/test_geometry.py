"""Geometry property tests: even/odd packing and neighbor hops in the
flattened SoA layout [..., T, X, Y*Z].

Reference analog: test/check_geometry.c — exhaustive verification of the
index maps (g_iup/g_idn, lexic<->eo) on small lattices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu.lattice import (
    EVEN,
    ODD,
    Lattice,
    eo_pack,
    eo_unpack,
    hop_packed,
    pack_gauge_eo,
    shift_full,
)

LAT = Lattice((4, 4, 6, 8))


def _rand_field(key, lat, inner=(2,)):
    return jax.random.normal(key, inner + lat.site_shape)


def _as4d(f, lat):
    """[..., T, X, Y*Z] -> [..., T, X, Y, Z] numpy view for index checks."""
    t, x, y, z = lat.dims
    return np.asarray(f).reshape(f.shape[:-1] + (y, z))


def test_pack_unpack_roundtrip():
    f = _rand_field(jax.random.key(0), LAT)
    e, o = eo_pack(f, LAT)
    assert e.shape == (2,) + LAT.eo_site_shape
    np.testing.assert_array_equal(np.asarray(eo_unpack(e, o, LAT)), np.asarray(f))


def test_pack_layout_explicit():
    """even[..., t, x, y*Zh+k] == f[..., t, x, y*Z + 2k+s], s=(t+x+y)%2."""
    f = _rand_field(jax.random.key(1), LAT)
    e, o = eo_pack(f, LAT)
    f4 = _as4d(f, LAT)
    e4 = np.asarray(e).reshape(e.shape[:-1] + (LAT.dims[2], LAT.zh))
    o4 = np.asarray(o).reshape(o.shape[:-1] + (LAT.dims[2], LAT.zh))
    T, X, Y, Z = LAT.dims
    for t in range(T):
        for x in range(X):
            for y in range(Y):
                s = (t + x + y) % 2
                for k in range(Z // 2):
                    np.testing.assert_array_equal(e4[:, t, x, y, k], f4[:, t, x, y, 2 * k + s])
                    np.testing.assert_array_equal(o4[:, t, x, y, k], f4[:, t, x, y, 2 * k + 1 - s])


@pytest.mark.parametrize("mu", range(4))
@pytest.mark.parametrize("d", [+1, -1])
def test_shift_full_explicit(mu, d):
    """shift_full agrees with an explicit numpy roll on the 4D view."""
    f = _rand_field(jax.random.key(5), LAT)
    got = _as4d(shift_full(f, mu, d, LAT), LAT)
    f4 = _as4d(f, LAT)
    axis = {0: 1, 1: 2, 2: 3, 3: 4}[mu]  # f4 axes: [inner, T, X, Y, Z]
    ref = np.roll(f4, -d, axis=axis)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("mu", range(4))
@pytest.mark.parametrize("d", [+1, -1])
def test_hop_packed_matches_full_shift(mu, d):
    """hop_packed == eo_pack(shift_full): packed neighbor gather agrees with
    the full-lattice shift (the check_geometry strategy)."""
    f = _rand_field(jax.random.key(2), LAT)
    e, o = eo_pack(f, LAT)
    ge, go = eo_pack(shift_full(f, mu, d, LAT), LAT)
    np.testing.assert_array_equal(np.asarray(hop_packed(o, EVEN, mu, d, LAT)), np.asarray(ge))
    np.testing.assert_array_equal(np.asarray(hop_packed(e, ODD, mu, d, LAT)), np.asarray(go))


def test_gauge_pack_shape():
    u = jax.random.normal(jax.random.key(3), (3, 3, 4) + LAT.site_shape)
    ueo = pack_gauge_eo(u, LAT)
    assert ueo.shape == (2, 3, 3, 4) + LAT.eo_site_shape


def test_odd_z_extent_rejected():
    with pytest.raises(ValueError):
        Lattice((4, 4, 4, 5))
