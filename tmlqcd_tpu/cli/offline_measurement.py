"""Offline measurement driver: run the configured measurement list over
stored gauge configurations.

Reference: offline_measurement.c (survey §2.10).

Usage:
    python -m tmlqcd_tpu.cli.offline_measurement -f sample.input \
        -c conf.000010.npz [conf.000020.npz ...] [-o outdir]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp


def main(argv=None):
    from tmlqcd_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser(description="offline measurements")
    ap.add_argument("-f", "--input", required=True)
    ap.add_argument("-c", "--configs", nargs="+", required=True)
    ap.add_argument("-o", "--output-dir", default=".")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tmlqcd_tpu.config_tmlqcd import read_input
    from tmlqcd_tpu.io.checkpoint import load_checkpoint
    from tmlqcd_tpu.meas.runner import run_measurements
    from tmlqcd_tpu.ops.gauge_action import plaquette

    cfg = read_input(args.input)
    lat = cfg.lat
    os.makedirs(args.output_dir, exist_ok=True)
    # frequency gates are against (traj+1) % freq == 0; offline we force all
    cfg = cfg.__class__(**{**cfg.__dict__, "meas": tuple(
        m.__class__(**{**m.__dict__, "frequency": 1}) for m in cfg.meas
    )})

    key = jax.random.key(cfg.seed)
    for path in args.configs:
        arr, traj, _ = load_checkpoint(path, lat)
        u = jnp.asarray(arr, jnp.complex64)
        plaq = float(plaquette(u, lat))
        print(f"[meas] {path}: trajectory {traj}, plaquette {plaq:.8f}")
        run_measurements(cfg, u, lat, traj - 1, args.output_dir, key)
    return 0


if __name__ == "__main__":
    sys.exit(main())
