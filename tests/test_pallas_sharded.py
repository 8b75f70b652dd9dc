"""t-sharded Pallas dslash vs unsharded (8 virtual CPU devices, interpret
kernels) — the multi-chip analog of test/check_xchange.c."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import EVEN, ODD, Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import dslash_pallas as dp
from tmlqcd_tpu.ops import wilson as w


@pytest.mark.slow
def test_tshard_pallas_matches_unsharded():
    lat = Lattice((8, 4, 4, 4))  # T=8 over 4 shards -> T_loc=2 (even)
    params = w.DiracParams(kappa=0.15, mu=0.01)
    ph = w.boundary_phases(params, lat)
    u = su3.random_su3(jax.random.key(0), (4,) + lat.site_shape, jnp.complex64)
    ueo = pack_gauge_eo(u, lat)
    psi = rng.normal_spinor(jax.random.key(1), (4, 3) + lat.eo_site_shape, jnp.complex64)
    ug = dp.gauge_copy(ueo, lat, ph)
    ug0 = dp.split_c(ug[EVEN]).astype(jnp.float32)
    psis = dp.split_c(psi).astype(jnp.float32)

    ref = dp.hopping_pallas_split(ug0, psis, EVEN, lat, interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("t",))
    ug_s = jax.device_put(ug0, NamedSharding(mesh, P(None, None, None, None, "t")))
    psi_s = jax.device_put(psis, NamedSharding(mesh, P(None, None, None, "t")))
    out = jax.jit(
        lambda a, b: dp.hopping_pallas_tshard(a, b, EVEN, lat, mesh, interpret=True)
    )(ug_s, psi_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # halfspinor-compressed halos (xchange_halffield analog): same result
    # up to reconstruction rounding (W^+ (0.5 W s) = s exactly in exact
    # arithmetic)
    out_h = jax.jit(
        lambda a, b: dp.hopping_pallas_tshard(
            a, b, EVEN, lat, mesh, interpret=True, halfspinor=True
        )
    )(ug_s, psi_s)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out), atol=1e-6)


def test_halfspinor_projection_roundtrip():
    """The compression identity behind the 2-spinor halo exchange:
    W^+ (0.5 W (W^+ psi)) == W^+ psi for both t-isometries (reference:
    the halfspinor trick of operator/halfspinor_hopping.h)."""
    psi = dp.split_c(
        rng.normal_spinor(jax.random.key(3), (4, 3, 8), jnp.complex64)
    ).astype(jnp.float32)
    for w_ in dp._W[0]:
        s = dp._spin_map_split(w_.conj().T, psi)
        rec = dp._spin_map_split(0.5 * w_, s)
        s2 = dp._spin_map_split(w_.conj().T, rec)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-6)
        assert s.shape[1] == 2  # half the spin components over the wire
