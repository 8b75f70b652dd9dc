"""Distribution helpers: device meshes, lattice shardings, parallel chains.

Reference: mpi_init.c (`tmlqcd_mpi_init` — the MPI Cartesian grid) and the
xchange/ halo machinery (survey §2.3).  On TPU there is NO transport code:
jnp.roll on sharded axes lowers to XLA collective-permutes over ICI, and
reductions to psums.  This module only builds meshes and shardings.

Axes: the packed-field site dims are (T, X, M = Y*Z/2); production meshes
shard 't' (time) and 'm' (the flattened y-slab axis) — the 2D analog of the
reference's --with-mpidimension=2.  The Pallas dslash currently runs
single-device per shard under shard_map (halo exchange at the jnp level
via lattice.hop_packed's rolls); whole-array GSPMD uses the jnp operators.

Parallel chains (survey §2.11 "replica parallelism"): the reference runs
independent HMC streams as separate jobs; here `parallel_chains` vmaps the
trajectory over a leading chain axis — one compiled program advancing many
Markov chains, shardable over devices by the chain axis.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "gauge_spec",
    "spinor_spec",
    "shard_gauge",
    "parallel_chains",
    "chain_init",
    "gather_to_host",
    "place_from_host",
    "load_gauge_sharded",
]

# layouts (see tmlqcd_tpu.lattice):
#   gauge full   [3, 3, 4, T, X, Mf]
#   gauge packed [2, 3, 3, 4, T, X, M]
#   spinor packed [4, 3, T, X, M]
GAUGE_FULL_SPEC = P(None, None, None, "t", None, "m")
GAUGE_EO_SPEC = P(None, None, None, None, "t", None, "m")
SPINOR_EO_SPEC = P(None, None, "t", None, "m")


def make_mesh(shape: tuple[int, int] | None = None, devices=None) -> Mesh:
    """2D ('t', 'm') device mesh (reference: MPI_Cart_create over
    NrTProcs x ...).  Default: all devices, as square as possible with the
    larger factor on 't'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        a = 1
        for c in range(1, int(n**0.5) + 1):
            if n % c == 0:
                a = c
        shape = (max(a, n // a), min(a, n // a))
    return Mesh(np.asarray(devices[: shape[0] * shape[1]]).reshape(shape), ("t", "m"))


def gauge_spec(mesh: Mesh, packed: bool = False) -> NamedSharding:
    return NamedSharding(mesh, GAUGE_EO_SPEC if packed else GAUGE_FULL_SPEC)


def spinor_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, SPINOR_EO_SPEC)


def shard_gauge(u: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a full gauge field on the mesh (validates divisibility)."""
    t_sh, m_sh = mesh.shape["t"], mesh.shape["m"]
    if u.shape[3] % t_sh or u.shape[5] % m_sh:
        raise ValueError(
            f"lattice (T={u.shape[3]}, M={u.shape[5]}) not divisible by mesh {dict(mesh.shape)}"
        )
    return jax.device_put(u, gauge_spec(mesh))


def gather_to_host(x) -> np.ndarray:
    """Global (possibly sharded, possibly multi-host) array -> full numpy
    array on the host — the checkpoint-writer staging (reference: the MPI
    gather inside io/gauge.c's write path / LEMON parallel writes).

    Single-process: jax assembles cross-device shards on device_get (complex
    arrays go through utils.to_host — see the axon d2h limitation).
    Multi-process: every process holds only its addressable shards, so an
    allgather over processes assembles the global array (each host then
    holds a full copy — callers write from process 0 only)."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if jax.process_count() > 1:  # pragma: no cover - needs real multi-host
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    from tmlqcd_tpu import utils

    return np.asarray(utils.to_host(x))


def place_from_host(arr: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Host array -> global sharded jax.Array with each device receiving
    ONLY its shard (jax.make_array_from_callback) — the multi-host-safe
    reader staging: every process reads the (replicated) checkpoint file
    and uploads just its addressable slices, no full-array device copy
    (reference: the per-rank scatter of io/gauge.c's read path)."""
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: np.ascontiguousarray(arr[idx])
    )


def load_gauge_sharded(path: str, mesh: Mesh, expect_lat=None):
    """Read a native/ILDG checkpoint and place the gauge field directly on
    the mesh -> (sharded u, trajectory, seed)."""
    from tmlqcd_tpu.io.checkpoint import load_checkpoint

    u, traj, seed = load_checkpoint(path, expect_lat)
    return place_from_host(u, gauge_spec(mesh)), traj, seed


def chain_init(n_chains: int, make_u, key: jax.Array) -> jax.Array:
    """Stack n independent hot starts along a leading chain axis."""
    keys = jax.random.split(key, n_chains)
    return jax.vmap(make_u)(keys)


def parallel_chains(cfg, u_stack: jax.Array, keys: jax.Array):
    """One trajectory on every chain: vmapped hmc_trajectory
    (u_stack [C, ...gauge], keys [C]) -> (u' [C, ...], stats batched).

    Shard the chain axis over devices for embarrassingly-parallel streams
    (BASELINE config 5 "parallel HMC streams")."""
    from tmlqcd_tpu.hmc.trajectory import hmc_trajectory

    step = jax.vmap(functools.partial(hmc_trajectory, cfg))
    return step(u_stack, keys)


def halo_bytes_per_dslash(
    lat,
    mesh_shape: tuple[int, int],
    halfspinor: bool = True,
    bytes_per_real: int = 4,
) -> dict:
    """Simulated ICI communication volume of ONE sharded hopping application
    per chip (reference: the xchange_field message sizes; VERDICT r1 weak
    #10 — know the comm budget BEFORE the first real multi-chip run).

    mesh_shape = (t_shards, m_shards) over (T, Y).  Per chip and per
    application the kernel path exchanges one t-slice in each t-direction
    (2 messages of [spin, 3, X_loc=X, M_loc] sites) and one y-slice in each
    m-direction; halfspinor halves the spin components (4 -> 2).

    Returns bytes sent per chip per hopping application, plus derived
    per-CG-iteration (4 hops in Qhat_pm) figures and the compute bytes for
    a comm/compute ratio.
    """
    tsh, msh = mesh_shape
    t, x, y, z = lat.dims
    m_loc = lat.m // msh
    t_loc = t // tsh
    spin = 2 if halfspinor else 4
    reals = spin * 3 * 2  # spin x color x (re, im)
    site_b = reals * bytes_per_real
    t_halo = 2 * x * m_loc * site_b if tsh > 1 else 0
    m_halo = 2 * t_loc * x * lat.zh * site_b if msh > 1 else 0
    per_hop = t_halo + m_halo
    # local HBM traffic of one hop application (the tb=1 kernel model)
    sites_loc = t_loc * x * m_loc
    hbm = (576 + 3 * 96 + 96) * sites_loc
    return {
        "bytes_per_hop": per_hop,
        "t_halo_bytes": t_halo,
        "m_halo_bytes": m_halo,
        "bytes_per_cg_iteration": 4 * per_hop,  # Qhat_pm = 4 hops
        "hbm_bytes_per_hop": hbm,
        "comm_to_hbm_ratio": per_hop / hbm if hbm else 0.0,
        "local_sites": sites_loc,
    }
