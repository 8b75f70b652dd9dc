"""Dslash/roofline benchmark driver (reference: benchmark.c, survey §3.4).

Times repeated even/odd dslash pairs at 1320 flops/site, reports GFLOP/s,
HBM-roofline fraction, and solver throughput.  `bench.py` at the repo root
wraps this for the driver's one-line JSON contract.

Usage: python -m tmlqcd_tpu.cli.benchmark [--dims 32 32 32 64] [--apps 100]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from tmlqcd_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser(description="dslash benchmark")
    ap.add_argument("--dims", type=int, nargs=4, default=None)
    ap.add_argument("--apps", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import json

    import jax

    sys.path.insert(0, ".")
    import bench

    dims = tuple(args.dims) if args.dims else ((8, 8, 8, 16) if jax.default_backend() == "cpu" else (32, 32, 32, 64))
    n_apps = args.apps or (4 if jax.default_backend() == "cpu" else 50)
    r = bench.bench_dslash(dims=dims, n_apps=n_apps)
    print(json.dumps(r, default=str, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
