"""Propagator-inversion driver: the `invert -f input` equivalent.

Reference: invert.c main() (survey §3.3): read input -> read gauge ->
operator registry from BeginOperator blocks -> per source spin/color
component: prepare source, invert, write propagator.

Usage:
    python -m tmlqcd_tpu.cli.invert -f sample.input -c conf.000010.npz \
        [--source point|z2] [--timeslice 0] [-o outdir]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from tmlqcd_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser(description="TPU-native propagator inverter")
    ap.add_argument("-f", "--input", required=True)
    ap.add_argument("-c", "--config", default=None,
                    help="gauge checkpoint (.npz or ILDG); default: the "
                    "input file's GaugeConfigInputFile.<InitialStoreCounter> "
                    "(reference: invert.c conf numbering)")
    ap.add_argument("--source", default=None, choices=["point", "z2"],
                    help="overrides the input file's SourceType")
    ap.add_argument("--timeslice", type=int, default=None,
                    help="overrides the input file's SourceTimeslice")
    ap.add_argument("--seed", type=int, default=171)
    ap.add_argument("--format", default="lime", choices=["lime", "npz"],
                    help="propagator output: SciDAC LIME records or npz")
    ap.add_argument("-o", "--output-dir", default=".")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize() "
                    "(also TMLQCD_TPU_DISTRIBUTED=1)")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.distributed or os.environ.get("TMLQCD_TPU_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        print(f"[invert] distributed: process {jax.process_index()} of "
              f"{jax.process_count()}")

    from tmlqcd_tpu.config_tmlqcd import read_input
    from tmlqcd_tpu.inverter import invert_clover_eo, invert_eo
    from tmlqcd_tpu.io.checkpoint import load_checkpoint
    from tmlqcd_tpu.meas.sources import point_source, z2_timeslice_source
    from tmlqcd_tpu.ops.wilson import DiracParams

    cfg = read_input(args.input)
    lat = cfg.lat
    conf = args.config
    if conf is None:
        if not cfg.gauge_config_input:
            print("[invert] no --config and no GaugeConfigInputFile in input",
                  file=sys.stderr)
            return 1
        # reference: invert.c reads <GaugeConfigInputFile>.<nstore:04d>
        n = cfg.initial_store_counter
        conf = (f"{cfg.gauge_config_input}.{int(n):04d}"
                if isinstance(n, int) else cfg.gauge_config_input)
    arr, traj, _ = load_checkpoint(conf, lat)
    u = jnp.asarray(arr, jnp.complex64)
    os.makedirs(args.output_dir, exist_ok=True)

    # operator-level stout smearing of the gauge field (reference:
    # stout_smear.c, UseStoutSmearing/StoutRho/StoutNoIterations): every
    # operator below sees the smeared links; sources/correlators keep
    # their own Jacobi/APE smearing independent of this
    if cfg.use_stout_smearing and cfg.stout_iterations > 0:
        from tmlqcd_tpu.meas.smearing import stout_smear

        u = jax.jit(lambda x: stout_smear(
            x, lat, cfg.stout_rho, cfg.stout_iterations))(u)
        print(f"[invert] stout smearing: rho={cfg.stout_rho} "
              f"iters={cfg.stout_iterations}")

    if not cfg.operators:
        print("[invert] no BeginOperator block in input", file=sys.stderr)
        return 1

    for iop, op in enumerate(cfg.operators):
        mu = op.two_kappa_mu / (2 * op.kappa) if op.kappa else 0.0
        params = DiracParams(kappa=op.kappa, mu=mu, c_sw=op.csw, theta=tuple(op.theta))
        is_clover = op.type.upper() in ("CLOVER",)
        is_overlap = op.type.upper() == "OVERLAP"
        is_doublet = op.type.upper() in ("DBTMWILSON", "DBCLOVER")
        inv = invert_clover_eo if is_clover else invert_eo
        tol = float(op.precision) ** 0.5

        if is_doublet:
            # non-degenerate strange/charm doublet (reference:
            # invert_doublet_eo.c, operator types DBTMWILSON / DBCLOVER with
            # 2Kappamubar/2Kappaepsbar); each spin-color source goes into
            # the upper flavor slot and the solve returns the flavor PAIR
            from tmlqcd_tpu.ops.ndoublet import NDParams

            two_k = 2.0 * op.kappa if op.kappa else 1.0
            nd_params = NDParams(
                kappa=op.kappa,
                mubar=op.two_kappa_mubar / two_k,
                epsbar=op.two_kappa_epsbar / two_k,
                c_sw=op.csw if op.type.upper() == "DBCLOVER" else 0.0,
                theta=tuple(op.theta),
            )

        if is_overlap:
            # overlap: build the sign-function setup (Lanczos low modes +
            # Chebyshev coefficients) once per gauge, then SUMR/CGNE solves
            # on the full lattice (reference: invert.c OVERLAP branch +
            # Dov_psi.c; no e/o preconditioning for the overlap)
            from tmlqcd_tpu.ops import overlap as _ov

            t0 = time.perf_counter()
            ov_params = _ov.OverlapParams(
                rho=1.0 + op.overlap_s, m=op.overlap_m,
                degree=op.sign_degree, n_ev=op.sign_n_ev,
                theta=tuple(op.theta),
            )
            ov_setup = _ov.make_overlap(u, ov_params, lat)
            print(f"[invert] op {iop}: overlap setup ({op.sign_n_ev} modes, "
                  f"degree {op.sign_degree}, sign err {ov_setup.sign_err:.2e}) "
                  f"built in {time.perf_counter() - t0:.1f}s")

            def inv(u_, src, params_, lat_, tol=tol, maxiter=0, **kw):
                return _ov.invert_overlap(
                    ov_setup, src, tol=tol, maxiter=maxiter,
                    solver=op.solver if op.solver in ("sumr", "cgne") else "sumr",
                )

        # per-operator solver routing (reference: operator.c solver field);
        # MG setup is built ONCE per gauge+operator and reused across all
        # sources (reference: DDalphaAMG setup/update lifecycle)
        inv_kw = {"solver": op.solver}
        if op.solver in ("dflfgmres", "dflgcr", "dfl") and not is_clover:
            from tmlqcd_tpu.inverter import make_deflation_setup

            t0 = time.perf_counter()
            defl = make_deflation_setup(u, params, lat)
            jax.block_until_ready(defl.v)
            print(f"[invert] op {iop}: MG setup built in "
                  f"{time.perf_counter() - t0:.1f}s")
            inv_kw["deflation_setup"] = defl

        # source selection: CLI flags override the input file's
        # SourceType/SourceTimeslice keys (reference: source_generation.c)
        src_kind = args.source or ("z2" if cfg.source_type.startswith("timeslice") else "point")
        ts = args.timeslice if args.timeslice is not None else cfg.source_timeslice
        if src_kind == "point":
            sources = [
                (s, c, point_source(lat, s, c, (ts, 0, 0, 0), u.dtype))
                for s in range(4)
                for c in range(3)
            ]
        else:
            key = jax.random.key(args.seed)
            sources = [
                (0, 0, z2_timeslice_source(lat, ts, key, u.dtype))
            ]

        # gauge-covariant source smearing (reference: jacobi.c): Jacobi
        # sweeps on APE-smeared spatial links, built once per gauge
        if cfg.use_source_smearing:
            from tmlqcd_tpu.meas.smearing import ape_smear_spatial, jacobi_smear

            u_ape = (ape_smear_spatial(u, lat, cfg.ape_alpha, cfg.ape_iterations)
                     if cfg.ape_iterations > 0 else u)
            smear = jax.jit(lambda s: jacobi_smear(
                s, u_ape, lat, cfg.jacobi_kappa, cfg.jacobi_iterations))
            sources = [(s, c, smear(src)) for s, c, src in sources]

        from tmlqcd_tpu.utils import to_host

        if is_doublet:
            from tmlqcd_tpu.inverter import invert_doublet_eo

            sol2 = np.zeros((len(sources), 2, 4, 3) + lat.site_shape, np.complex64)
            solve_db = jax.jit(lambda b: invert_doublet_eo(
                u, b, nd_params, lat, tol=tol, maxiter=op.max_solver_iterations))
            for i, (s, c, src) in enumerate(sources):
                t0 = time.perf_counter()
                b2 = jnp.stack([src, jnp.zeros_like(src)])
                res = solve_db(b2)
                jax.block_until_ready(res.x)
                sol2[i] = to_host(res.x)
                print(
                    f"[invert] op {iop} ({op.type}) source (s={s},c={c}): "
                    f"{int(res.iterations)} iters, |r|^2={float(res.residual_sq):.3e}, "
                    f"{time.perf_counter() - t0:.1f}s"
                )
            if args.format == "lime":
                from tmlqcd_tpu.io.propagator import write_propagator

                # one file per flavor (reference: invert_doublet writes the
                # strange/charm propagator pair)
                for fl in range(2):
                    out = os.path.join(
                        args.output_dir,
                        f"propagator.{iop:02d}.fl{fl}.{traj:06d}.lime",
                    )
                    write_propagator(out, [sol2[i, fl] for i in range(len(sources))],
                                     lat, precision=op.propagator_precision)
                    print(f"[invert] wrote {out}")
            else:
                out = os.path.join(args.output_dir, f"propagator.{iop:02d}.{traj:06d}.npz")
                np.savez_compressed(
                    out, propagator_doublet=sol2,
                    spin_color=[(s, c) for s, c, _ in sources],
                    kappa=op.kappa, mubar=nd_params.mubar, epsbar=nd_params.epsbar,
                    csw=nd_params.c_sw, dims=np.asarray(lat.dims), trajectory=traj,
                )
                print(f"[invert] wrote {out}")
            continue

        sol = np.zeros((len(sources), 4, 3) + lat.site_shape, np.complex64)
        if op.solver == "increigcg" and not is_overlap and not is_clover:
            # sequential solves with incremental eigCG deflation (reference:
            # incr_eigcg): later spin-color columns reuse the low modes
            # harvested by earlier ones
            from tmlqcd_tpu.inverter import invert_eo_increigcg

            t0 = time.perf_counter()
            results = invert_eo_increigcg(
                u, [src for _, _, src in sources], params, lat, tol=tol,
                maxiter=op.max_solver_iterations,
            )
            for i, res in enumerate(results):
                sol[i] = to_host(res.x)
            dt = time.perf_counter() - t0
            print(
                f"[invert] op {iop} ({op.type}) {len(sources)} sources "
                f"incr-eigcg: iters {[int(r.iterations) for r in results]}, "
                f"{dt:.1f}s"
            )
        elif len(sources) > 1 and op.solver in ("cg", "fastcg") and not is_overlap:
            # all spin-color columns as ONE batched solve on the multi-RHS
            # kernel: the gauge stream is read once per tile and shared by
            # the whole batch (reference: invert.c's independent per-column
            # cg_her solves, fused here for ~2.3x per-column throughput)
            from tmlqcd_tpu.inverter import invert_eo_rhs

            t0 = time.perf_counter()
            bs = jnp.stack([src for _, _, src in sources])
            res = invert_eo_rhs(u, bs, params, lat, tol=tol,
                                maxiter=op.max_solver_iterations)
            jax.block_until_ready(res.x)
            dt = time.perf_counter() - t0
            sol[:] = to_host(res.x)
            rmax = float(jnp.max(res.residual_sq))
            print(
                f"[invert] op {iop} ({op.type}) {len(sources)} sources batched: "
                f"{int(res.iterations)} iters, max|r|^2={rmax:.3e}, {dt:.1f}s"
            )
        else:
            for i, (s, c, src) in enumerate(sources):
                t0 = time.perf_counter()
                res = inv(u, src, params, lat, tol=tol,
                          maxiter=op.max_solver_iterations, **inv_kw)
                jax.block_until_ready(res.x)
                dt = time.perf_counter() - t0
                sol[i] = to_host(res.x)
                print(
                    f"[invert] op {iop} ({op.type}) source (s={s},c={c}): "
                    f"{int(res.iterations)} iters, |r|^2={float(res.residual_sq):.3e}, {dt:.1f}s"
                )

        if args.format == "lime":
            from tmlqcd_tpu.io.propagator import write_propagator

            out = os.path.join(args.output_dir, f"propagator.{iop:02d}.{traj:06d}.lime")
            # reference: PropagatorPrecision = 32 writes sloppy propagators
            write_propagator(out, [sol[i] for i in range(len(sources))], lat,
                             precision=op.propagator_precision)
        else:
            out = os.path.join(args.output_dir, f"propagator.{iop:02d}.{traj:06d}.npz")
            np.savez_compressed(
                out,
                propagator=sol,
                spin_color=[(s, c) for s, c, _ in sources],
                kappa=op.kappa,
                mu=mu,
                csw=op.csw,
                dims=np.asarray(lat.dims),
                trajectory=traj,
            )
        print(f"[invert] wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
