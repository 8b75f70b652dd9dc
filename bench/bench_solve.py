"""Propagator-solve benchmark: time the production CG on Qhat_pm with the
Pallas fast path vs the jnp reference path.

Reference: the solve portion of the invert driver (survey §3.3) — the
"serving" hot loop.  Protocol hardened like bench.py: fresh keyed inputs,
host-forced scalar dependence, two-length differencing.

Usage: python bench/bench_solve.py [--dims T X Y Z] [--iters N]
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
    ap.add_argument("--dims", type=int, nargs=4, default=None)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args(argv)

    from tmlqcd_tpu import rng, su3
    from tmlqcd_tpu.lattice import Lattice, pack_gauge_eo
    from tmlqcd_tpu.ops import wilson as w
    from tmlqcd_tpu.ops import wilson_fast as wf
    from tmlqcd_tpu.solvers.cg import cg

    on_cpu = jax.default_backend() == "cpu"
    dims = tuple(args.dims) if args.dims else ((8, 8, 8, 16) if on_cpu else (32, 32, 32, 64))
    iters = 4 if on_cpu else args.iters
    lat = Lattice(dims)
    params = w.DiracParams(kappa=0.15, mu=0.01)
    ph = w.boundary_phases(params, lat)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def run(key, n, fast):
        u = su3.random_su3(key, (4,) + lat.site_shape, jnp.complex64)
        b = rng.normal_spinor(
            jax.random.fold_in(key, 1), (4, 3) + lat.eo_site_shape, jnp.complex64
        )
        if fast:
            fg = wf.make_fast_gauge(u, params, lat)
            mv = lambda x: wf.q_hat_pm_fast(fg, x, params, lat)
            b2 = wf.to_split(b)
        else:
            ueo = pack_gauge_eo(u, lat)
            mv = lambda x: w.q_hat_pm(ueo, x, params, lat, ph)
            b2 = b
        # tol=0 forces exactly n iterations of the real production CG
        res = cg(mv, b2, tol=0.0, maxiter=n, rel_prec=False)
        return res.residual_sq

    out = {}
    for fast in (True, False):
        n_lo, n_hi = max(iters // 10, 1), iters
        for n in (n_lo, n_hi):
            float(run(jax.random.key(7), n, fast))  # compile
        best = {}
        for n in (n_lo, n_hi):
            b = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                float(run(jax.random.key(100 + 10 * rep + (n == n_hi)), n, fast))
                b = min(b, time.perf_counter() - t0)
            best[n] = b
        per_iter = (best[n_hi] - best[n_lo]) / (n_hi - n_lo)
        # each Qhat_pm = 4 dslash applications at 1320 flops/site
        gflops = 4 * 1320 * (lat.volume / 2) / per_iter / 1e9
        out["pallas" if fast else "reference"] = {
            "ms_per_cg_iteration": round(per_iter * 1e3, 3),
            "dslash_gflops": round(gflops, 1),
        }
    print(json.dumps({"metric": "cg_iteration", "lattice": list(dims), **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
