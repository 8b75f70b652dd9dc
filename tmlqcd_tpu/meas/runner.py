"""Measurement dispatch: run the configured measurement list every
`frequency` trajectories (reference: meas/measurements.c registry +
the dispatch inside the hmc_tm loop, survey §3.5)."""

from __future__ import annotations

import os

import jax
import numpy as np

from tmlqcd_tpu.lattice import Lattice

__all__ = ["run_measurements"]


def run_measurements(cfg, u, lat: Lattice, traj: int, run_dir: str, key) -> None:
    """cfg: RunConfig; writes onlinemeas.NNNNNN / gradflow / polyakov files."""
    from tmlqcd_tpu.meas import online_measurement, polyakov_loop, wilson_flow
    from tmlqcd_tpu.ops.wilson import DiracParams

    for i, m in enumerate(cfg.meas):
        if m.frequency <= 0 or (traj + 1) % m.frequency != 0:
            continue
        ty = m.type.upper()
        mkey = jax.random.fold_in(jax.random.fold_in(key, traj), 7000 + i)
        if ty == "ONLINE":
            params = DiracParams(
                kappa=m.kappa, mu=m.two_kappa_mu / (2 * m.kappa) if m.kappa else 0.0
            )
            cpp, cpa, t0 = online_measurement(
                u, params, lat, mkey,
                tol=float(m.precision) ** 0.5, maxiter=m.max_solver_iterations,
            )
            path = os.path.join(run_dir, f"onlinemeas.{traj:06d}")
            with open(path, "w") as f:
                # reference column layout: type t C_PP C_PA
                for t in range(lat.dims[0]):
                    f.write(f"1 1 {t} {float(cpp[t]):.12e} {float(cpa[t]):.12e}\n")
        elif ty == "PIONNORM":
            from tmlqcd_tpu.meas import pion_norm

            params = DiracParams(
                kappa=m.kappa, mu=m.two_kappa_mu / (2 * m.kappa) if m.kappa else 0.0
            )
            cpn = pion_norm(
                u, params, lat, mkey,
                tol=float(m.precision) ** 0.5, maxiter=m.max_solver_iterations,
            )
            path = os.path.join(run_dir, f"pionnorm.{traj:06d}")
            with open(path, "w") as f:
                for t in range(lat.dims[0]):
                    f.write(f"{t} {float(cpn[t]):.12e}\n")
        elif ty == "GRADIENTFLOW":
            res = wilson_flow(u, lat, eps=m.flow_eps, n_steps=m.flow_steps)
            path = os.path.join(run_dir, f"gradflow.{traj:06d}")
            with open(path, "w") as f:
                f.write("# t t2E_plaq t2E_clover\n")
                for t, ep, ec in zip(
                    np.asarray(res.times), np.asarray(res.t2e_plaq), np.asarray(res.t2e_clover)
                ):
                    f.write(f"{t:.6f} {ep:.10e} {ec:.10e}\n")
        elif ty == "POLYAKOV":
            pl = complex(polyakov_loop(u, lat, m.direction))
            with open(os.path.join(run_dir, "polyakov.data"), "a") as f:
                f.write(f"{traj:08d} {m.direction} {pl.real:+.10e} {pl.imag:+.10e}\n")
        elif ty == "ORIENTEDPLAQUETTES":
            from tmlqcd_tpu.meas import oriented_plaquettes

            op = np.asarray(oriented_plaquettes(u, lat))
            with open(os.path.join(run_dir, "oriented_plaquettes.data"), "a") as f:
                f.write(f"{traj:08d} " + " ".join(f"{v:.10f}" for v in op) + "\n")
        elif ty == "SFCOUPLING":
            from tmlqcd_tpu.ops.sf import sf_observables

            obs = sf_observables(u, cfg.beta, lat, m.eta, m.nu, m.ct)
            with open(os.path.join(run_dir, "sf_coupling.data"), "a") as f:
                # columns: traj dS/deta k S_sf  (ensemble estimator:
                # gbar^2 = k / <dS/deta>; reference: sf_observables.c)
                f.write(
                    f"{traj:08d} {float(obs['dS_deta']):+.10e} "
                    f"{float(obs['k']):.10e} {float(obs['action']):.10e}\n"
                )
        elif ty == "FIELDSTRENGTH":
            from tmlqcd_tpu.meas import field_strength_observables

            ep, ec, q = field_strength_observables(u, lat)
            with open(os.path.join(run_dir, "field_strength.data"), "a") as f:
                # columns: traj E_plaq E_clover Q_clover (reference:
                # measure_clover_field_strength_observables.c)
                f.write(f"{traj:08d} {float(ep):.10e} {float(ec):.10e} {float(q):+.10e}\n")
