"""HMC driver: the `hmc_tm -f input` equivalent.

Reference: hmc_tm.c main() (survey §3.1 call stack): read input -> init ->
start config (hot/cold/continue) -> trajectory loop with output.data logging,
periodic measurements, checkpoints every NSave, reversibility checks.

Usage:
    python -m tmlqcd_tpu.cli.hmc -f sample.input [-o rundir]

output.data column contract (reference: survey §5.5, one line per
trajectory): traj plaquette rectangle dH exp(-dH) accept seconds
"""

from __future__ import annotations

import argparse
import functools
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp


class _GracefulStop:
    """Signal -> finish the current trajectory, checkpoint, exit cleanly
    (reference: sighandler.c — queue preemption triggers a clean stop so no
    work is lost between NSave points; survey §5.3)."""

    def __init__(self):
        self.stop = False
        for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGUSR1):
            try:
                signal.signal(sig, self._handler)
            except (ValueError, OSError):  # pragma: no cover (non-main thread)
                pass

    def _handler(self, signum, frame):
        print(f"[hmc] caught signal {signum}: will checkpoint and stop "
              f"after the current trajectory", flush=True)
        self.stop = True


def main(argv=None):
    from tmlqcd_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser(description="TPU-native twisted-mass HMC")
    ap.add_argument("-f", "--input", required=True, help="tmLQCD-style input file")
    ap.add_argument("-o", "--output-dir", default=None, help="run directory")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize() from the "
                    "TPU pod environment (reference: tmlqcd_mpi_init; also "
                    "TMLQCD_TPU_DISTRIBUTED=1)")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.distributed or os.environ.get("TMLQCD_TPU_DISTRIBUTED") == "1":
        # one process per host, coordinator/process ids from the pod
        # runtime environment; all jax.devices() below become global
        jax.distributed.initialize()
        print(f"[hmc] distributed: process {jax.process_index()} of "
              f"{jax.process_count()}")

    from tmlqcd_tpu import su3
    from tmlqcd_tpu.config import build_hmc
    from tmlqcd_tpu.config_tmlqcd import read_input
    from tmlqcd_tpu.hmc import chrono_states, hmc_trajectory, reversibility_check
    from tmlqcd_tpu.io.checkpoint import (
        checkpoint_at,
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from tmlqcd_tpu.meas.runner import run_measurements
    from tmlqcd_tpu.ops.gauge_action import rectangle

    cfg = read_input(args.input)
    run_dir = args.output_dir or cfg.output_dir
    os.makedirs(run_dir, exist_ok=True)
    hmc = build_hmc(cfg)
    lat = cfg.lat

    # domain decomposition (reference: tmlqcd_mpi_init building the
    # Cartesian grid from NrTProcs/NrYProcs before anything touches fields).
    # Explicit hints win; otherwise auto-mesh over all visible devices.
    # The active mesh routes every fast solve through the sharded Pallas
    # kernel (ppermute halos + interior/surface overlap).
    from tmlqcd_tpu import parallel

    mesh = parallel.mesh_from_procs(cfg.nr_procs, lat)
    if mesh is None:
        mesh = parallel.auto_mesh(lat)
    if mesh is not None:
        parallel.set_active_mesh(mesh)
        print(f"[hmc] device mesh {dict(mesh.shape)} over "
              f"{mesh.devices.size} devices (t x y slabs: "
              f"{lat.dims[0]//mesh.shape['t']} x {lat.dims[2]//mesh.shape['m']})")

    def _place(arr):
        """Device placement: shard over the mesh (each device gets only its
        slab; multi-host-safe callback staging for host arrays) or plain
        device put."""
        if mesh is None:
            return jnp.asarray(arr)
        if isinstance(arr, jax.Array):
            return jax.device_put(arr, parallel.gauge_spec(mesh))
        return parallel.place_from_host(arr, parallel.gauge_spec(mesh))

    key = jax.random.key(cfg.seed)
    start_traj = 0
    if cfg.start_condition == "continue":
        # InitialStoreCounter = readin -> nstore_counter file; = N -> conf.N
        # (reference: hmc_tm.c resume bookkeeping, survey §2.8)
        if isinstance(cfg.initial_store_counter, int):
            info = checkpoint_at(run_dir, cfg.initial_store_counter)
        else:
            info = latest_checkpoint(run_dir)
        if info is None:
            print(f"[hmc] no checkpoint in {run_dir}, falling back to hot start")
            u = _place(jax.jit(lambda k: su3.random_su3(k, (4,) + lat.site_shape))(
                jax.random.fold_in(key, 0)
            ))
        elif mesh is not None:
            # sharded read: every process reads the file, each device
            # uploads ONLY its slab (reference: the per-rank scatter of
            # lemon MPI-IO gauge reads)
            u, start_traj, _ = parallel.load_gauge_sharded(info.path, mesh, lat)
            print(f"[hmc] resumed (sharded) at trajectory {start_traj} from {info.path}")
        else:
            arr, start_traj, _ = load_checkpoint(info.path, lat)
            u = _place(arr)
            print(f"[hmc] resumed at trajectory {start_traj} from {info.path}")
    elif cfg.start_condition == "cold":
        u = _place(jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.complex64).reshape(3, 3, 1, 1, 1, 1),
            (3, 3, 4) + lat.site_shape,
        ))
    else:  # hot (jitted: eager op chains are fragile on the remote-TPU path)
        u = _place(jax.jit(lambda k: su3.random_su3(k, (4,) + lat.site_shape))(
            jax.random.fold_in(key, 0)
        ))

    # spectral-interval validation of rational/polynomial monomials against
    # the starting configuration (reference: ndrat/phmc init eigenvalue
    # check; mis-bracketed intervals corrupt the heatbath exactness)
    if any(hasattr(m, "s_min") for m in hmc.monomials):
        from tmlqcd_tpu.hmc.validate import check_rational_intervals

        check_rational_intervals(hmc, u, key=jax.random.fold_in(key, 10**6))

    step = jax.jit(functools.partial(hmc_trajectory, hmc))
    # chrono history persisted ACROSS trajectories (reference: csg_field
    # lives in the monomial struct for the whole run; reset on reject
    # inside hmc_trajectory)
    chrono = chrono_states(hmc)
    rect_fn = jax.jit(lambda u: rectangle(u, lat))
    udef_fn = jax.jit(su3.unitarity_defect)
    out_path = os.path.join(run_dir, "output.data")
    out = open(out_path, "a", buffering=1)

    monitor_every = 10  # reference: monitor_forces at DebugLevel >= 2
    stopper = _GracefulStop()

    n_acc = 0
    traj = start_traj - 1
    for traj in range(start_traj, start_traj + cfg.measurements):
        t0 = time.perf_counter()
        u, st, chrono = step(u, jax.random.fold_in(key, traj + 1), chrono)
        jax.block_until_ready(u)
        dt = time.perf_counter() - t0
        acc = int(st.accepted)
        n_acc += acc
        iters = " ".join(str(int(i)) for i in st.acc_iterations)
        fiters = " ".join(str(int(i)) for i in st.force_iterations)
        line = (
            f"{traj:08d} {float(st.plaquette):.12f} {float(rect_fn(u)):.12f} "
            f"{float(st.delta_h):+.6e} {float(st.exp_mdh):.6e} {acc} {dt:.3f} {iters}"
        )
        out.write(line + "\n")
        if cfg.debug_level >= 1:
            print(f"[traj {traj}] plaq={float(st.plaquette):.6f} "
                  f"dH={float(st.delta_h):+.4f} acc={acc} ({dt:.1f}s) "
                  f"force_iters=[{fiters}]")

        if cfg.debug_level >= 2 and (traj + 1) % monitor_every == 0:
            # per-monomial force norms + SU(3) drift (reference:
            # monitor_forces.c at DebugLevel>=2; restoresu3 drift check)
            from tmlqcd_tpu.hmc.monitor import monitor_forces

            for fs in monitor_forces(hmc, u, jax.random.fold_in(key, -2 * traj - 2)):
                msg = (f"# force {fs.name} ts={fs.timescale} "
                       f"|F|^2={fs.norm_sq:.6e} max={fs.max_abs:.6e} rms={fs.rms:.6e}")
                print(msg)
                out.write(msg + "\n")
            udef = float(udef_fn(u))
            print(f"# unitarity defect max|U^+U - 1| = {udef:.3e}")
            out.write(f"# unitarity_defect {udef:.6e}\n")

        run_measurements(cfg, u, lat, traj, run_dir, key)

        if cfg.reversibility_check and (traj + 1) % cfg.reversibility_interval == 0:
            ddh, du = jax.jit(functools.partial(reversibility_check, hmc))(
                u, jax.random.fold_in(key, -traj - 1)
            )
            print(f"[traj {traj}] reversibility: |ddH|={float(ddh):.3e} "
                  f"max|dU|={float(du):.3e}")

        if (
            (traj + 1) % cfg.nsave == 0
            or traj == start_traj + cfg.measurements - 1
            or stopper.stop
        ):
            path = save_checkpoint(
                run_dir, u, traj + 1, cfg.seed, lat,
                fmt=cfg.checkpoint_format, plaquette=float(st.plaquette),
                beta=cfg.beta, precision=cfg.gauge_write_precision,
            )
            if cfg.debug_level >= 1:
                print(f"[traj {traj}] checkpoint -> {path}")

        if stopper.stop:
            print(f"[hmc] graceful stop after trajectory {traj} "
                  f"(resume with StartCondition = continue)")
            break

    out.close()
    total = traj - start_traj + 1
    print(f"[hmc] done: {total} trajectories, acceptance {n_acc/max(total,1):.2%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
