"""Mixed-precision regime probe: where does the bf16-sloppy-gauge inner CG
pay off (reference: mixed_cg_her.c — "BASELINE config 4 requires this")?

Round-4 finding (16^3x32 Hasenbusch point, kappa=0.13, tol 1e-8): the bf16
noise floor inflates inner iterations ~10x, so `Solver = auto` resolves to
plain f32 CG.  VERDICT r5 asks for the regime where mixed precision DOES
pay: light-mass (kappa -> kappa_c) solves are iteration-bound, the
defect-correction restarts amortize, and the 1.2x bandwidth win of the
halved gauge stream can come through.  This harness measures exactly that:

  1. thermalize a quenched background (bench_mg protocol),
  2. walk kappa toward kappa_c until plain CG needs >ITERS_MIN iterations,
  3. time fastcg vs fastmixed per solve at that point and at a heavy kappa,
     at tol 1e-8, and report iterations + wall time + speedup.

Usage: python bench/bench_mixed.py [--dims 8 8 8 16] [--therm 40]
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
    ap.add_argument("--therm", type=int, default=40)
    ap.add_argument("--mu", type=float, default=0.001)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--iters-min", type=int, default=300)
    args = ap.parse_args(argv)

    from tmlqcd_tpu import su3
    from tmlqcd_tpu.hmc import hmc_trajectory
    from tmlqcd_tpu.inverter import invert_eo
    from tmlqcd_tpu.lattice import Lattice
    from tmlqcd_tpu.meas.sources import point_source
    from tmlqcd_tpu.models.suites import pure_gauge
    from tmlqcd_tpu.ops.wilson import DiracParams

    on_cpu = jax.default_backend() == "cpu"
    dims = tuple(args.dims) if args.dims else ((4, 4, 4, 8) if on_cpu else (8, 8, 8, 16))
    lat = Lattice(dims)

    u = su3.random_su3(jax.random.key(0), (4,) + lat.site_shape, jnp.complex64)
    gstep = jax.jit(functools.partial(hmc_trajectory, pure_gauge(lat, beta=6.0, steps=10)))
    for i in range(args.therm):
        u, st = gstep(u, jax.random.key(500 + i))
    print(f"# thermalized: plaq={float(st.plaquette):.4f}", file=sys.stderr)

    src = point_source(lat, 0, 0, (0, 0, 0, 0), jnp.complex64)

    def solve(kappa, solver):
        p = DiracParams(kappa=kappa, mu=args.mu)
        fn = jax.jit(functools.partial(
            lambda u_, s_, p=p, solver=solver: invert_eo(
                u_, s_, p, lat, tol=args.tol, maxiter=6000, solver=solver
            )
        ))
        res = fn(u, src)
        jax.block_until_ready(res.x)  # compile + warm
        t0 = time.perf_counter()
        res = fn(u, src)
        it = int(res.iterations)
        dt = time.perf_counter() - t0
        return it, dt, float(res.residual_sq)

    # kappa walk toward kappa_c of THIS background until CG is
    # iteration-bound (the regime the reference runs mixed CG in)
    kappa = 0.15
    while True:
        it, _, _ = solve(kappa, "fastcg")
        print(f"# kappa walk: kappa={kappa:.4f} cg iters={it}", file=sys.stderr)
        if it >= args.iters_min or kappa >= 0.30:
            break
        kappa = round(kappa + 0.01, 4)

    points = []
    for label, k in (("heavy", 0.15), ("light", kappa)):
        it_cg, t_cg, r_cg = solve(k, "fastcg")
        it_mx, t_mx, r_mx = solve(k, "fastmixed")
        points.append({
            "regime": label, "kappa": k, "mu": args.mu, "tol": args.tol,
            "cg": {"iters": it_cg, "seconds": round(t_cg, 4)},
            "mixed": {"inner_iters": it_mx, "seconds": round(t_mx, 4)},
            "mixed_speedup": round(t_cg / t_mx, 3),
        })
        print(f"# {label} kappa={k}: cg {it_cg} it/{t_cg:.3f}s · "
              f"mixed {it_mx} it/{t_mx:.3f}s · speedup {t_cg/t_mx:.2f}x",
              file=sys.stderr)

    light = points[-1]
    print(json.dumps({
        "metric": "mixed_precision_light_mass_speedup",
        "value": light["mixed_speedup"],
        "unit": "x vs plain f32 CG per solve",
        "lattice": list(dims),
        "points": points,
        "device": jax.devices()[0].device_kind,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
