"""I/O tests: LIME framing, ILDG round-trip with checksum verification,
native checkpoint save/load/resume (reference: test strategy §4 + io/*.c)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmlqcd_tpu import su3
from tmlqcd_tpu.io import (
    LimeRecord,
    latest_checkpoint,
    load_checkpoint,
    read_gauge_field,
    read_lime,
    save_checkpoint,
    write_gauge_field,
    write_lime,
)
from tmlqcd_tpu.lattice import Lattice
from tmlqcd_tpu.ops.gauge_action import plaquette

LAT = Lattice((4, 4, 4, 4))


def _u0(dt=jnp.complex128):
    return su3.random_su3(jax.random.key(3), (4,) + LAT.site_shape, dt)


def test_lime_roundtrip(tmp_path):
    p = str(tmp_path / "x.lime")
    recs = [
        LimeRecord("xlf-info", b"hello world", True, False),
        LimeRecord("ildg-binary-data", bytes(range(256)) * 3 + b"xy", False, True),
    ]
    write_lime(p, recs)
    back = read_lime(p)
    assert [r.type for r in back] == ["xlf-info", "ildg-binary-data"]
    assert back[0].data == b"hello world"
    assert back[1].data == recs[1].data
    assert back[0].msg_begin and not back[0].msg_end
    # header alignment: every record starts at a multiple of 8
    assert os.path.getsize(p) % 8 == 0


def test_ildg_roundtrip(tmp_path):
    u = np.asarray(_u0())
    p = str(tmp_path / "conf.lime")
    plaq = float(plaquette(jnp.asarray(u), LAT))
    write_gauge_field(p, u, LAT, plaquette=plaq, trajectory=42, beta=5.7, kappa=0.15)
    u2, hdr = read_gauge_field(p)
    np.testing.assert_array_equal(u, u2)  # f64 path is byte-exact
    assert hdr.lat.dims == LAT.dims
    assert hdr.trajectory == 42
    assert abs(hdr.plaquette - plaq) < 1e-10
    assert hdr.precision == 64
    # re-reading after a byte flip must fail the checksum
    raw = bytearray(open(p, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    bad = str(tmp_path / "bad.lime")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum|magic|truncated"):
        read_gauge_field(bad)


def test_ildg_f32(tmp_path):
    u = np.asarray(_u0())
    p = str(tmp_path / "conf32.lime")
    write_gauge_field(p, u, LAT, precision=32)
    u2, hdr = read_gauge_field(p)
    assert hdr.precision == 32
    np.testing.assert_allclose(u, u2, atol=1e-6)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    u = np.asarray(_u0(jnp.complex64))
    d = str(tmp_path / "run")
    save_checkpoint(d, u, trajectory=7, seed=123, lat=LAT)
    save_checkpoint(d, u, trajectory=9, seed=123, lat=LAT)
    info = latest_checkpoint(d)
    assert info.trajectory == 9 and info.seed == 123
    u2, traj, seed = load_checkpoint(info.path, LAT)
    np.testing.assert_array_equal(u, u2)
    assert (traj, seed) == (9, 123)


def test_checkpoint_ildg_format(tmp_path):
    u = np.asarray(_u0())
    d = str(tmp_path / "run")
    save_checkpoint(d, u, trajectory=3, seed=1, lat=LAT, fmt="ildg", beta=5.7)
    info = latest_checkpoint(d)
    u2, traj, _ = load_checkpoint(info.path, LAT)
    np.testing.assert_array_equal(u, u2)
    assert traj == 3
