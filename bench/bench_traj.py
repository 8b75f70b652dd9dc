"""HMC trajectory benchmark: trajectories/hour at a fixed physics point.

Reference: the per-trajectory wall-time column of output.data (survey §5.5)
and BASELINE.md's "HMC throughput" metric.

Usage: python bench/bench_traj.py [--dims T X Y Z] [--n 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(argv=None):
    from tmlqcd_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs=4, default=None)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--therm", type=int, default=10)
    ap.add_argument("--solver", default="auto",
                    help="per-monomial Solver override (auto|cg|mixedcg|rgmixedcg)")
    args = ap.parse_args(argv)

    from tmlqcd_tpu import su3
    from tmlqcd_tpu.lattice import Lattice
    from tmlqcd_tpu.models.suites import nf2_twisted_mass_hasenbusch, pure_gauge
    from tmlqcd_tpu.hmc import hmc_trajectory

    on_cpu = jax.default_backend() == "cpu"
    dims = tuple(args.dims) if args.dims else ((4, 4, 4, 8) if on_cpu else (16, 16, 16, 32))
    lat = Lattice(dims)
    # kappa safely below kappa_c of the thermalized background: solves
    # converge (not maxiter-saturated) and acceptance is honest — the
    # round-1 point (kappa=0.16, supercritical on this background) timed
    # 1000-iteration saturated solves and rejected everything
    cfg = nf2_twisted_mass_hasenbusch(
        lat, beta=5.3, kappa=0.13, mu=0.01, mu_hasenbusch=0.1,
        tau=1.0, steps=(2, 2, 5), acc_tol=1e-8, force_tol=1e-7, maxiter=1000,
    )
    if args.solver != "auto":
        import dataclasses
        cfg = dataclasses.replace(cfg, monomials=tuple(
            dataclasses.replace(m, solver=args.solver) if hasattr(m, "solver") else m
            for m in cfg.monomials))
    step = jax.jit(functools.partial(hmc_trajectory, cfg))
    u = su3.random_su3(jax.random.key(0), (4,) + lat.site_shape, jnp.complex64)

    # thermalize with the QUENCHED action first (a hot start is
    # super-critical for kappa=0.16: the fermion trajectory rejects forever
    # and the timing would measure an unphysical conditioning), then
    # compile+warm the full action
    gstep = jax.jit(functools.partial(hmc_trajectory, pure_gauge(lat, beta=5.3, steps=8)))
    for i in range(max(args.therm, 1)):
        u, st = gstep(u, jax.random.key(1000 + i))
    print(f"# quenched therm: plaq={float(st.plaquette):.4f}", file=sys.stderr)
    u, st = step(u, jax.random.key(1))
    float(st.delta_h)

    times, accepts, dhs = [], [], []
    for i in range(args.n):
        t0 = time.perf_counter()
        u, st = step(u, jax.random.key(100 + i))
        dh = float(st.delta_h)  # host transfer forces completion
        times.append(time.perf_counter() - t0)
        dhs.append(dh)
        accepts.append(int(st.accepted))
    best = min(times)
    print(
        json.dumps(
            {
                "metric": "hmc_trajectory_seconds",
                "value": round(best, 3),
                "trajectories_per_hour": round(3600.0 / best, 1),
                "lattice": list(dims),
                "acceptance": sum(accepts) / len(accepts),
                "mean_abs_dh": round(sum(abs(d) for d in dhs) / len(dhs), 4),
                "device": jax.devices()[0].device_kind,
                "solver": args.solver,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
