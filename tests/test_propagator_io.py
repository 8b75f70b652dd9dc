"""Propagator LIME I/O round-trip (reference: io/spinor_write.c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import rng
from tmlqcd_tpu.io import read_propagator, write_propagator
from tmlqcd_tpu.lattice import Lattice

LAT = Lattice((4, 4, 4, 4))


def test_propagator_roundtrip(tmp_path):
    comps = [
        np.asarray(
            rng.normal_spinor(jax.random.key(i), (4, 3) + LAT.site_shape, jnp.complex128)
        )
        for i in range(3)
    ]
    p = str(tmp_path / "prop.lime")
    write_propagator(p, comps, LAT)
    back, prec = read_propagator(p, LAT)
    assert prec == 64 and len(back) == 3
    for a, b in zip(comps, back):
        np.testing.assert_array_equal(a, b)


def test_propagator_checksum_detects_corruption(tmp_path):
    comps = [
        np.asarray(
            rng.normal_spinor(jax.random.key(9), (4, 3) + LAT.site_shape, jnp.complex64)
        )
    ]
    p = str(tmp_path / "prop.lime")
    write_propagator(p, comps, LAT, precision=32)
    raw = bytearray(open(p, "rb").read())
    raw[len(raw) // 2] ^= 0x55
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum|size|magic"):
        read_propagator(p, LAT)
