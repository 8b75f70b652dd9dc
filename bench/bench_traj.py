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
    ap.add_argument("--profile", action="store_true",
                    help="per-phase breakdown: heatbath / force solves per "
                    "monomial / drifts / acceptance (reference: the per-phase "
                    "gettime discipline of survey §5.1)")
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
    from tmlqcd_tpu.hmc import chrono_states

    step = jax.jit(functools.partial(hmc_trajectory, cfg))
    step_ch = jax.jit(functools.partial(hmc_trajectory, cfg))
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

    times, accepts, dhs, fits = [], [], [], []
    for i in range(args.n):
        t0 = time.perf_counter()
        u, st = step(u, jax.random.key(100 + i))
        dh = float(st.delta_h)  # host transfer forces completion
        times.append(time.perf_counter() - t0)
        dhs.append(dh)
        accepts.append(int(st.accepted))
        fits.append([int(x) for x in st.force_iterations])
    best = min(times)

    # cross-trajectory chrono (reference: csg_field persisting for the whole
    # run): same trajectories with the driver-held history threaded through
    u_ch = u
    ch = chrono_states(cfg)
    times_ch, fits_ch = [], []
    u_ch, _, ch = step_ch(u_ch, jax.random.key(99), ch)  # compile + warm
    for i in range(args.n):
        t0 = time.perf_counter()
        u_ch, st, ch = step_ch(u_ch, jax.random.key(100 + i), ch)
        float(st.delta_h)
        times_ch.append(time.perf_counter() - t0)
        fits_ch.append([int(x) for x in st.force_iterations])
    best_ch = min(times_ch)
    out = {
        "metric": "hmc_trajectory_seconds",
        "value": round(best, 3),
        "trajectories_per_hour": round(3600.0 / best, 1),
        "lattice": list(dims),
        "acceptance": sum(accepts) / len(accepts),
        "mean_abs_dh": round(sum(abs(d) for d in dhs) / len(dhs), 4),
        "device": jax.devices()[0].device_kind,
        "solver": args.solver,
        "chrono_cross_traj": {
            "trajectory_seconds": round(best_ch, 3),
            "speedup_vs_per_traj_chrono": round(best / best_ch, 3),
            "mean_force_iters": [round(sum(c) / len(c), 1) for c in zip(*fits)],
            "mean_force_iters_persistent": [
                round(sum(c) / len(c), 1) for c in zip(*fits_ch)
            ],
        },
    }
    if args.profile:
        out["profile"] = _profile_phases(cfg, u, best)
    print(json.dumps(out))
    return 0


def _profile_phases(cfg, u, traj_best: float) -> dict:
    """Per-phase wall-clock attribution of one trajectory (reference: the
    gettime() brackets around heatbath / derivative / update_gauge /
    accfunction in update_tm.c, survey §5.1).

    Each phase runs as its own jitted program (timed after a warmup call);
    force and drift costs are scaled by their per-trajectory counts from the
    integrator's flat schedule.  The sum can differ from the measured
    trajectory time: the whole-trajectory program lets XLA overlap/fuse
    across phase boundaries, and chrono-warmed MD solves converge faster
    than the cold solves timed here — both effects show up as 'unattributed'.
    """
    from tmlqcd_tpu import rng, su3
    from tmlqcd_tpu.hmc.integrators import _expand_schedule
    from tmlqcd_tpu.hmc.trajectory import _heatbaths

    key = jax.random.key(4242)

    # per-dispatch overhead (remote-tunnel round trip + jit call cost):
    # subtracted from every standalone phase timing so the table reflects
    # on-device work, not host<->TPU latency x call count
    idty = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    jax.block_until_ready(idty(z))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(idty(z))
    overhead = (time.perf_counter() - t0) / 10.0

    def timed(fn, *a):
        fn_j = jax.jit(fn)
        jax.block_until_ready(fn_j(*a))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*a))
        return max(time.perf_counter() - t0 - overhead, 0.0)

    prof = {"per_call_overhead_s": round(overhead, 5)}
    prof["momenta_+_heatbaths_s"] = timed(
        lambda u, k: (su3.random_momenta(k, u.shape[2:], u.dtype),
                      _heatbaths(cfg, u, k)[1]), u, key,
    )

    aux_list, _ = jax.jit(lambda u, k: _heatbaths(cfg, u, k))(u, key)
    kick_rows, drift_dts = _expand_schedule(
        cfg.integrator, tuple(m.timescale for m in cfg.monomials)
    )
    n_drifts = int((drift_dts != 0.0).sum())

    p = jax.jit(lambda k: su3.random_momenta(k, u.shape[2:], u.dtype))(key)
    prof["drift_s_x" + str(n_drifts)] = n_drifts * timed(
        lambda u, p: su3.project_su3(su3.mul(su3.expm_ta(0.01 * p), u)), u, p
    )

    # aux (pseudofermions) must be jit ARGUMENTS, not captured constants:
    # the axon transport cannot stage complex closure constants host-side
    for i, m in enumerate(cfg.monomials):
        n_kicks = int((kick_rows[:, i] != 0.0).sum())
        if aux_list[i] is None:
            prof[f"force_{m.name}_s_x{n_kicks}"] = n_kicks * timed(
                lambda u, m=m: m.force(u, None), u)
        elif hasattr(m, "force_info"):
            prof[f"force_{m.name}_s_x{n_kicks}"] = n_kicks * timed(
                lambda u, a, m=m: m.force_info(u, a)[0], u, aux_list[i])
        else:
            prof[f"force_{m.name}_s_x{n_kicks}"] = n_kicks * timed(
                lambda u, a, m=m: m.force(u, a), u, aux_list[i])

    acc = 0.0
    for i, m in enumerate(cfg.monomials):
        if aux_list[i] is None:
            acc += timed(lambda u, m=m: m.action(u, None), u)
        elif hasattr(m, "action_info"):
            acc += timed(lambda u, a, m=m: m.action_info(u, a)[0], u, aux_list[i])
        else:
            acc += timed(lambda u, a, m=m: m.action(u, a), u, aux_list[i])
    prof["acceptance_actions_s"] = acc

    total = sum(v for k, v in prof.items() if k != "per_call_overhead_s")
    prof = {k: round(v, 4) for k, v in prof.items()}
    prof["sum_of_phases_s"] = round(total, 4)
    prof["measured_trajectory_s"] = round(traj_best, 4)
    prof["unattributed_s"] = round(traj_best - total, 4)
    return prof


if __name__ == "__main__":
    sys.exit(main())
