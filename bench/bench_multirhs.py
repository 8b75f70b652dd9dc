"""Multi-RHS dslash throughput: per-RHS GFLOP/s vs batch width R.

The multi-RHS kernel build (ops/dslash_pallas, R as the innermost grid axis
with gauge index maps that ignore it) reads the dominant gauge stream ONCE
per (t, m) tile and shares it across the batch, so per-RHS HBM traffic
drops from 624 B/site (R=1, compressed) toward 240 B/site (R→inf) — the
propagator-inversion serving path (reference: invert.c runs the 12
spin-color point-source columns as independent full-bandwidth cg_her
solves; here they ride one batched solve, see inverter.invert_eo_rhs).

Same hardened timing protocol as bench.py: fresh keys inside jit, scalar
host fetch, two-length differencing.

Usage: python bench/bench_multirhs.py [--dims 16 16 16 32] [--rhs 1 2 4 8 12]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs=4, default=[16, 16, 16, 32])
    ap.add_argument("--rhs", type=int, nargs="+", default=[1, 2, 4, 8, 12])
    ap.add_argument("--apps", type=int, default=50)
    args = ap.parse_args(argv)

    from bench import FLOPS_PER_SITE, device_bandwidth
    from tmlqcd_tpu import rng, su3
    from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
    from tmlqcd_tpu.ops import wilson as w
    from tmlqcd_tpu.ops import wilson_fast as wf

    lat = Lattice(tuple(args.dims))
    params = w.DiracParams(kappa=0.15, mu=0.01)
    dtype = jnp.complex64

    u = su3.random_su3(jax.random.key(0), (4,) + lat.site_shape, dtype)
    fg = wf.make_fast_gauge(u, params, lat)
    jax.block_until_ready(fg.ug_even)

    results = []
    for r in args.rhs:
        shape = ((4, 3) if r == 1 else (r, 4, 3)) + lat.eo_site_shape

        @functools.partial(jax.jit, static_argnums=(1,))
        def run(key, n, r=r, shape=shape):
            psi = rng.normal_spinor(key, shape, dtype)
            p2 = wf.to_split(psi) if r == 1 else wf.to_split_rhs(psi)

            def body(ps, _):
                return wf.q_hat_pm_fast(fg, ps, params, lat), None

            out, _ = jax.lax.scan(body, p2, None, length=n)
            return jnp.sum(jnp.abs(out))

        n_lo, n_hi = max(args.apps // 10, 1), args.apps + max(args.apps // 10, 1)
        for n in (n_lo, n_hi):
            float(run(jax.random.key(99), n))
        best = {}
        for n in (n_lo, n_hi):
            b = float("inf")
            for rep in range(3):
                key = jax.random.key(1000 + 10 * rep + (n == n_hi))
                t0 = time.perf_counter()
                float(run(key, n))
                b = min(b, time.perf_counter() - t0)
            best[n] = b

        # q_hat_pm = 4 hoppings (2 per q_hat application)
        apps = 4 * (n_hi - n_lo)
        sites = lat.volume / 2
        dt = best[n_hi] - best[n_lo]
        gflops_per_rhs = FLOPS_PER_SITE * sites * apps / dt / 1e9
        # per-RHS ideal traffic: gauge 384 B/site (compressed) shared by R,
        # psi in + out 96+96 B/site each
        bytes_per_site = (8 * 12) * 4 / r + (24 + 24) * 4
        roof = device_bandwidth() / bytes_per_site * FLOPS_PER_SITE / 1e9
        results.append(
            {
                "rhs": r,
                "gflops_per_rhs": round(gflops_per_rhs, 1),
                "roofline_fraction": round(gflops_per_rhs / roof, 4),
                "s_per_application_per_rhs": dt / apps / r,
            }
        )
        print(f"  R={r:3d}: {gflops_per_rhs:8.1f} GF/s per RHS "
              f"({100 * gflops_per_rhs / roof:.1f}% of its roofline)", file=sys.stderr)

    base = results[0]["gflops_per_rhs"]
    out = {
        "metric": "multirhs_dslash_per_rhs_gflops",
        "value": results[-1]["gflops_per_rhs"],
        "unit": "GFLOP/s per RHS (1320 flops/site)",
        "vs_baseline": round(results[-1]["gflops_per_rhs"] / base, 4),
        "detail": {
            "dims": list(lat.dims),
            "device": jax.devices()[0].device_kind,
            "per_rhs": results,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
