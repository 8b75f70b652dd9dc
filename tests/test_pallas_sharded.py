"""Domain-decomposed Pallas dslash vs unsharded (8 virtual CPU devices,
interpret kernels) — the multi-chip analog of test/check_xchange.c.

Covers the round-2 production sharded path `hopping_pallas_shard`:
2D (t, m) meshes, interior/surface overlap split (Hopping_Matrix_nocom
analog), halfspinor-compressed halos on BOTH axes, and the operator-level
q_hat_pm on the sharded kernel; plus the legacy t-only concat path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmlqcd_tpu import rng, su3
from tmlqcd_tpu.lattice import EVEN, ODD, Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import dslash_pallas as dp
from tmlqcd_tpu.ops import wilson as w
from tmlqcd_tpu.ops import wilson_fast as wf

LAT = Lattice((8, 4, 4, 4))
PARAMS = w.DiracParams(kappa=0.15, mu=0.01)


@pytest.fixture(scope="module")
def fields():
    ph = w.boundary_phases(PARAMS, LAT)
    u = su3.random_su3(jax.random.key(0), (4,) + LAT.site_shape, jnp.complex64)
    ueo = pack_gauge_eo(u, LAT)
    psi = rng.normal_spinor(jax.random.key(1), (4, 3) + LAT.eo_site_shape, jnp.complex64)
    ug = dp.gauge_copy(ueo, LAT, ph)
    uge = dp.split_c(ug[EVEN]).astype(jnp.float32)
    ugo = dp.split_c(ug[ODD]).astype(jnp.float32)
    psis = dp.split_c(psi).astype(jnp.float32)
    return u, uge, ugo, psis


def test_shard_2d_overlap_halfspinor_matches_unsharded(fields):
    """t x m = 2 x 2 mesh (t_loc=4 exercises the interior kernel), all four
    (overlap, halfspinor) combinations bitwise vs the unsharded kernel."""
    _, uge, _, psis = fields
    ref = dp.hopping_pallas_split(uge, psis, EVEN, LAT, interpret=True)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("t", "m"))
    ug_s = jax.device_put(uge, NamedSharding(mesh, P(None, None, None, None, "t", None, "m")))
    psi_s = jax.device_put(psis, NamedSharding(mesh, P(None, None, None, "t", None, "m")))
    for overlap in (False, True):
        for hs in (False, True):
            out = jax.jit(
                lambda a, b: dp.hopping_pallas_shard(
                    a, b, EVEN, LAT, mesh, t_axis="t", m_axis="m",
                    interpret=True, halfspinor=hs, overlap=overlap,
                )
            )(ug_s, psi_s)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref)), (overlap, hs)


def test_shard_t_only_boundary_slabs(fields):
    """4 t-shards -> t_loc=2: every slab is pure surface (the boundary
    kernel handles both neighbors remote); odd parity."""
    _, _, ugo, psis = fields
    ref = dp.hopping_pallas_split(ugo, psis, ODD, LAT, interpret=True)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("t",))
    ug_s = jax.device_put(ugo, NamedSharding(mesh, P(None, None, None, None, "t")))
    psi_s = jax.device_put(psis, NamedSharding(mesh, P(None, None, None, "t")))
    out = jax.jit(
        lambda a, b: dp.hopping_pallas_shard(a, b, ODD, LAT, mesh, interpret=True)
    )(ug_s, psi_s)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qhat_pm_operator_on_sharded_kernel(fields):
    """Operator-level: Qhat_pm via the sharded kernel path equals the jnp
    operator (the multi-chip production CG matvec)."""
    u, _, _, psis = fields
    ph = w.boundary_phases(PARAMS, LAT)
    ueo = pack_gauge_eo(u, LAT)
    psi = dp.merge_c(psis, jnp.complex64)
    ref = w.q_hat_pm(ueo, psi, PARAMS, LAT, ph)

    fg = wf.make_fast_gauge(u, PARAMS, LAT)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("t", "m"))
    spec = P(None, None, None, "t", None, "m")
    ug_spec = NamedSharding(mesh, P(None, None, None, None, "t", None, "m"))
    ug_e = jax.device_put(fg.ug_even, ug_spec)
    ug_o = jax.device_put(fg.ug_odd, ug_spec)
    psi_s = jax.device_put(psis, NamedSharding(mesh, spec))
    with mesh:
        out2 = jax.jit(
            lambda ge, go, x: wf.q_hat_pm_fast_shard(
                wf.FastGauge(ug_even=ge, ug_odd=go, gcomp=fg.gcomp),
                x, PARAMS, LAT, mesh, m_axis="m"
            )
        )(ug_e, ug_o, psi_s)
    out = dp.merge_c(out2, jnp.complex64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_legacy_tshard_concat_path(fields):
    """The round-1 t-shard path (concat ext + in-kernel m-wrap) still
    matches, with and without halfspinor halos."""
    _, uge, _, psis = fields
    ref = dp.hopping_pallas_split(uge, psis, EVEN, LAT, interpret=True)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("t",))
    ug_s = jax.device_put(uge, NamedSharding(mesh, P(None, None, None, None, "t")))
    psi_s = jax.device_put(psis, NamedSharding(mesh, P(None, None, None, "t")))
    for hs in (False, True):
        out = jax.jit(
            lambda a, b: dp.hopping_pallas_tshard(
                a, b, EVEN, LAT, mesh, interpret=True, halfspinor=hs
            )
        )(ug_s, psi_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_halfspinor_projection_roundtrip():
    """The compression identity behind the 2-spinor halo exchange:
    W^+ (0.5 W (W^+ psi)) == W^+ psi for the t AND y isometries (reference:
    the halfspinor trick of operator/halfspinor_hopping.h)."""
    psi = dp.split_c(
        rng.normal_spinor(jax.random.key(3), (4, 3, 8), jnp.complex64)
    ).astype(jnp.float32)
    for mu in (0, 2):
        for w_ in dp._W[mu]:
            s = dp._spin_map_split(w_.conj().T, psi)
            rec = dp._spin_map_split(0.5 * w_, s)
            s2 = dp._spin_map_split(w_.conj().T, rec)
            np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-6)
            assert s.shape[1] == 2  # half the spin components over the wire


def test_shard_multirhs_matches_per_column(fields):
    """Multi-RHS on the DOMAIN-DECOMPOSED kernel (round 5): an R axis at
    r_axis=3 rides the sharded builds — gauge block reused across the R grid
    steps, halos batched into single ppermutes — bitwise equal to R
    independent sharded calls (reference: invert's 12 spin-color columns
    under the MPI decomposition)."""
    _, uge, _, psis = fields
    R = 3
    cols2 = dp.split_c(
        rng.normal_spinor(jax.random.key(7), (R, 4, 3) + LAT.eo_site_shape, jnp.complex64)
    ).astype(jnp.float32)  # [2, R, 4, 3, T, X, M]
    psir = jnp.moveaxis(cols2, 1, 3)  # [2, 4, 3, R, T, X, M]

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("t", "m"))
    ug_s = jax.device_put(uge, NamedSharding(mesh, P(None, None, None, None, "t", None, "m")))
    one = jax.jit(
        lambda a, b: dp.hopping_pallas_shard(
            a, b, EVEN, LAT, mesh, t_axis="t", m_axis="m", interpret=True
        )
    )
    ref = jnp.stack(
        [one(ug_s, jax.device_put(cols2[:, r], NamedSharding(mesh, P(None, None, None, "t", None, "m"))))
         for r in range(R)], axis=3,
    )
    psir_s = jax.device_put(
        psir, NamedSharding(mesh, P(None, None, None, None, "t", None, "m")))
    out = jax.jit(
        lambda a, b: dp.hopping_pallas_shard(
            a, b, EVEN, LAT, mesh, t_axis="t", m_axis="m", interpret=True
        )
    )(ug_s, psir_s)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # flavor-doublet layout (r_axis=1): the batched _hop_nd_shard call
    chi_s = jax.device_put(
        cols2[:, :2], NamedSharding(mesh, P(None, None, None, None, "t", None, "m")))
    out_nd = jax.jit(
        lambda a, b: dp.hopping_pallas_shard(
            a, b, EVEN, LAT, mesh, t_axis="t", m_axis="m", interpret=True
        )
    )(ug_s, chi_s)
    np.testing.assert_array_equal(
        np.asarray(out_nd), np.asarray(jnp.moveaxis(ref, 3, 1)[:, :2])
    )
