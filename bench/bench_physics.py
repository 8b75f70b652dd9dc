"""Physics known-answer benchmark: quenched SU(3) Wilson plaquette vs
literature (BASELINE staged config 1, upgraded to 8^4 statistics).

Reference analog: running the hmc_tm sample input and comparing the
output.data plaquette column against published pure-gauge values — the
standard first validation of any new lattice code (SURVEY §7 / BASELINE.md
"Physics correctness" row).

Literature values (knowledge-derived, standard quenched Wilson-action
plaquette <Re tr P/3>; see e.g. Boyd et al. Nucl.Phys. B469 (1996) and the
widely reproduced beta=6.0 value):

    beta = 5.70 : 0.54919
    beta = 6.00 : 0.59368

Finite-volume effects on the plaquette at 8^4 are far below the quoted MC
errors here.  Statistics: C independent vmapped chains
(`parallel.parallel_chains`), therm discarded, error = the standard error of
the mean: std(ddof=1) of chain means / sqrt(C) (chains are independent by
construction: counter-based RNG keyed per chain).

Usage: python bench/bench_physics.py [--dims 8 8 8 8] [--chains 8]
       [--therm 150] [--n 400] [--beta 6.0 5.7]
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LITERATURE = {5.7: 0.54919, 6.0: 0.59368}


def run_point(lat, beta, chains, therm, n, seed, c1=0.0):
    from tmlqcd_tpu import su3
    from tmlqcd_tpu.models.suites import pure_gauge
    from tmlqcd_tpu.parallel import chain_init, parallel_chains

    cfg = pure_gauge(lat, beta=beta, c1=c1, steps=10)
    step = jax.jit(functools.partial(parallel_chains, cfg))

    key = jax.random.key(seed)
    make_u = lambda k: su3.random_su3(k, (4,) + lat.site_shape, jnp.complex64)
    u = chain_init(chains, make_u, key)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(chains))

    # scan over trajectories on-device: returns per-traj plaquette [n, C]
    def body(carry, i):
        u, keys = carry
        ks = jax.vmap(jax.random.fold_in)(keys, jnp.full((chains,), i))
        u2, st = step(u, ks)
        return (u2, keys), st.plaquette

    @functools.partial(jax.jit, static_argnames=("count",))
    def sweep(u, keys, start, count):
        (u2, _), plaq = jax.lax.scan(body, (u, keys), start + jnp.arange(count))
        return u2, plaq

    t0 = time.perf_counter()
    u, _ = sweep(u, keys, 0, therm)  # thermalization, discarded
    u, plaq = sweep(u, keys, therm, n)  # [n, C]
    plaq = jax.device_get(plaq).astype(float)
    dt = time.perf_counter() - t0

    chain_means = plaq.mean(axis=0)  # [C]
    mean = float(chain_means.mean())
    err = float(chain_means.std(ddof=1) / math.sqrt(chains))
    return mean, err, dt


def main(argv=None):
    from tmlqcd_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs=4, default=None)
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--therm", type=int, default=150)
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--beta", type=float, nargs="+", default=[6.0, 5.7])
    ap.add_argument("--no-tlsym", action="store_true",
                    help="skip the tlSym strong-coupling known-answer point")
    args = ap.parse_args(argv)

    from tmlqcd_tpu.lattice import Lattice

    on_cpu = jax.default_backend() == "cpu"
    dims = tuple(args.dims) if args.dims else ((4, 4, 4, 4) if on_cpu else (8, 8, 8, 8))
    therm, n = (20, 40) if (on_cpu and args.dims is None) else (args.therm, args.n)
    lat = Lattice(dims)

    points = []
    worst_sigma = 0.0
    for i, beta in enumerate(args.beta):
        mean, err, dt = run_point(lat, beta, args.chains, therm, n, seed=17 + i)
        lit = LITERATURE.get(beta)
        # LIT_TOL: the literature values above are knowledge-derived
        # (BASELINE.md provenance caveat) — allow 5e-4 transcription +
        # finite-volume systematic in quadrature with the MC error.
        LIT_TOL = 5e-4
        sigma = (
            abs(mean - lit) / math.sqrt(err**2 + LIT_TOL**2)
            if (lit and err > 0)
            else None
        )
        if sigma is not None:
            worst_sigma = max(worst_sigma, sigma)
        points.append(
            {
                "beta": beta,
                "plaquette": round(mean, 6),
                "err": round(err, 6),
                "literature": lit,
                "n_sigma": round(sigma, 2) if sigma is not None else None,
                "seconds": round(dt, 1),
            }
        )
        print(f"# beta={beta}: <P>={mean:.6f} +- {err:.6f}"
              + (f"  lit={lit}  ({sigma:.1f} sigma)" if sigma is not None else ""),
              file=sys.stderr)

    # tlSym (Luescher-Weisz tree-level, c1 = -1/12) strong-coupling point:
    # leading character expansion <P> = beta*c0/18 with c0 = 1 - 8*c1 — a
    # DERIVED known answer (not literature) pinning the rectangle term's
    # c0/c1 normalization through the full HMC stack; tolerance 20%% covers
    # the O((beta c0)^2) corrections (same slack as the in-suite Wilson
    # strong-coupling test at this coupling).
    if not args.no_tlsym:
        c1 = -1.0 / 12.0
        c0 = 1.0 - 8.0 * c1
        beta_sc = 1.0
        mean, err, dt = run_point(
            lat, beta_sc, args.chains, therm, n, seed=29, c1=c1
        )
        expect = beta_sc * c0 / 18.0
        rel = abs(mean - expect) / expect
        tl_ok = rel < 0.20
        if not tl_ok:
            worst_sigma = max(worst_sigma, 10.0)  # fail the gate
        points.append(
            {
                "action": "tlsym",
                "beta": beta_sc,
                "c1": c1,
                "plaquette": round(mean, 6),
                "err": round(err, 6),
                "strong_coupling_leading": round(expect, 6),
                "rel_dev": round(rel, 3),
                "seconds": round(dt, 1),
            }
        )
        print(f"# tlSym beta={beta_sc}: <P>={mean:.6f} +- {err:.6f}"
              f"  leading-SC={expect:.6f}  (rel dev {rel:.1%})",
              file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "quenched_plaquette_vs_literature",
                "value": round(worst_sigma, 2),
                "unit": "worst-point |deviation| in MC sigma",
                "vs_baseline": 1.0 if worst_sigma < 3.0 else 0.0,
                "lattice": list(dims),
                "chains": args.chains,
                "traj_per_chain": {"therm": therm, "measured": n},
                "points": points,
                "device": jax.devices()[0].device_kind,
            }
        )
    )
    return 0 if worst_sigma < 3.0 else 1


if __name__ == "__main__":
    sys.exit(main())
