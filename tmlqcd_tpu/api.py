"""Embedding API: the framework as an inverter/sampler library.

Reference: wrapper/lib_wrapper.c + include/tmLQCD.h (survey §2.10 L12) —
`tmLQCD_init_parallel_and_read_input`, `tmLQCD_read_gauge`, `tmLQCD_invert`,
`tmLQCD_get_gauge_field_pointer`, `tmLQCD_finalise` — the seam contraction
codes use to embed tmLQCD.  Here: a small session object over the typed
config; fields are jax arrays (no pointer indirection needed).

    import tmlqcd_tpu.api as tm
    s = tm.init("hmc.input")            # or tm.init(RunConfig(...))
    s.read_gauge("conf.000100.npz")     # or s.hot_start(seed)
    x = s.invert(source)                # first configured operator
    u = s.gauge                         # the current gauge field
    s.run_hmc(n_trajectories=10)        # advance the Markov chain in-process
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tmlqcd_tpu import su3
from tmlqcd_tpu.config import RunConfig, build_hmc
from tmlqcd_tpu.lattice import Lattice

__all__ = ["Session", "init"]


class Session:
    """One lattice + config + gauge field (reference: the global state that
    lib_wrapper.c initializes; here explicit and instantiable)."""

    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        self.lat: Lattice = cfg.lat
        self.gauge: jax.Array | None = None
        self.trajectory: int = 0
        self._hmc = None
        self._step = None

    # -- gauge management (tmLQCD_read_gauge / get_gauge_field_pointer) ----

    def read_gauge(self, path: str) -> None:
        from tmlqcd_tpu.io.checkpoint import load_checkpoint

        arr, traj, _ = load_checkpoint(path, self.lat)
        self.gauge = jnp.asarray(arr, jnp.complex64)
        self.trajectory = traj

    def write_gauge(self, path: str, fmt: str = "ildg") -> None:
        from tmlqcd_tpu.io import ildg
        from tmlqcd_tpu.ops.gauge_action import plaquette

        from tmlqcd_tpu.utils import to_host

        if fmt == "ildg":
            ildg.write_gauge_field(
                path,
                to_host(self.gauge),
                self.lat,
                plaquette=float(plaquette(self.gauge, self.lat)),
                trajectory=self.trajectory,
                beta=self.cfg.beta,
            )
        else:
            import numpy as np

            np.savez(path, gauge=to_host(self.gauge))

    def hot_start(self, seed: int | None = None) -> None:
        key = jax.random.key(self.cfg.seed if seed is None else seed)
        self.gauge = su3.random_su3(key, (4,) + self.lat.site_shape, jnp.complex64)

    def cold_start(self) -> None:
        self.gauge = jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.complex64).reshape(3, 3, 1, 1, 1, 1),
            (3, 3, 4) + self.lat.site_shape,
        )

    def plaquette(self) -> float:
        from tmlqcd_tpu.ops.gauge_action import plaquette

        return float(plaquette(self.gauge, self.lat))

    # -- inversion (tmLQCD_invert) ------------------------------------------

    def invert(self, source: jax.Array, op_index: int = 0, tol: float | None = None):
        """Solve M x = b for the op_index-th configured BeginOperator
        (reference: tmLQCD_invert).  Returns the full-lattice solution."""
        from tmlqcd_tpu.inverter import invert_clover_eo, invert_eo
        from tmlqcd_tpu.ops.wilson import DiracParams

        if not self.cfg.operators:
            raise ValueError("no BeginOperator configured")
        op = self.cfg.operators[op_index]
        mu = op.two_kappa_mu / (2 * op.kappa) if op.kappa else 0.0
        params = DiracParams(kappa=op.kappa, mu=mu, c_sw=op.csw)
        fn = invert_clover_eo if op.type.upper() == "CLOVER" else invert_eo
        res = fn(
            self.gauge,
            source,
            params,
            self.lat,
            tol=tol if tol is not None else float(op.precision) ** 0.5,
            maxiter=op.max_solver_iterations,
            solver=op.solver,
        )
        return res.x

    # -- sampling ------------------------------------------------------------

    def run_hmc(self, n_trajectories: int = 1, seed: int | None = None):
        """Advance the chain; returns the list of TrajectoryStats."""
        from tmlqcd_tpu.hmc import hmc_trajectory

        if self._hmc is None:
            self._hmc = build_hmc(self.cfg)
            self._step = jax.jit(functools.partial(hmc_trajectory, self._hmc))
        if self.gauge is None:
            self.hot_start(seed)
        key = jax.random.key(self.cfg.seed if seed is None else seed)
        stats = []
        for _ in range(n_trajectories):
            self.trajectory += 1
            self.gauge, st = self._step(self.gauge, jax.random.fold_in(key, self.trajectory))
            stats.append(st)
        return stats

    def finalize(self) -> None:
        """Drop field references (reference: tmLQCD_finalise)."""
        self.gauge = None
        self._hmc = self._step = None


def init(cfg_or_path) -> Session:
    """Create a session from a RunConfig or a tmLQCD-style input file
    (reference: tmLQCD_init_parallel_and_read_input)."""
    if isinstance(cfg_or_path, RunConfig):
        return Session(cfg_or_path)
    from tmlqcd_tpu.config_tmlqcd import read_input

    return Session(read_input(str(cfg_or_path)))
