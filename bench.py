"""Dslash roofline benchmark — the driver's headline metric.

Mirrors the reference's benchmark.c protocol (survey §3.4): time repeated
even/odd dslash pairs, report GFLOP/s at the community 1320 flops/site
convention, plus the fraction of the HBM-bandwidth roofline (dslash is
memory-bound at ~1.7 f32 flops/byte, so the bandwidth roofline is the honest
ceiling — survey §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured GFLOP/s over the BASELINE.json target of 60% of the
chip's HBM-bandwidth roofline.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from tmlqcd_tpu import su3
from tmlqcd_tpu.lattice import EVEN, ODD, Lattice, pack_gauge_eo
from tmlqcd_tpu.ops import wilson as w

# HBM bandwidth (bytes/s) by device kind — roofline denominators.
HBM_BW = {
    "TPU v4": 1.228e12,
    "TPU v5 lite": 0.819e12,
    "TPU v5e": 0.819e12,
    "TPU v5": 0.819e12,
    "TPU v5p": 2.765e12,
    "TPU v6 lite": 1.640e12,
    "TPU v6e": 1.640e12,
    "cpu": 50e9,
}

FLOPS_PER_SITE = 1320.0  # community Wilson-dslash convention (benchmark.c)


def device_bandwidth() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_BW.items():
        if kind.lower().startswith(k.lower()):
            return v
    return HBM_BW.get("cpu" if jax.default_backend() == "cpu" else "TPU v5 lite", 0.819e12)


def bench_dslash(dims=(32, 32, 32, 64), n_apps=100, dtype=jnp.complex64):
    lat = Lattice(dims)
    params = w.DiracParams(kappa=0.15, mu=0.01)
    ph = w.boundary_phases(params, lat)

    from tmlqcd_tpu import rng

    @jax.jit
    def make_fields(key):
        u = su3.random_su3(key, (4,) + lat.site_shape, dtype)
        ueo = pack_gauge_eo(u, lat)
        psi = rng.normal_spinor(jax.random.fold_in(key, 1), (4, 3) + lat.eo_site_shape, dtype)
        return ueo, psi

    ueo, psi = make_fields(jax.random.key(0))

    scale = jnp.asarray(1.0 / 64.0, jnp.float32)  # keep |psi| bounded (H has norm ~8/hop)

    @jax.jit
    def pairs(ueo, psi):
        # n_apps even/odd dslash pairs, chained so XLA cannot elide any
        def body(p, _):
            e = w.dslash_packed(ueo, p, EVEN, lat, ph)
            o = w.dslash_packed(ueo, e, ODD, lat, ph)
            return o * scale, None

        out, _ = jax.lax.scan(body, psi, None, length=n_apps)
        return out

    # warmup/compile, then best-of-3 (dispatch noise)
    pairs(ueo, psi).block_until_ready()
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pairs(ueo, psi).block_until_ready()
        dt = min(dt, time.perf_counter() - t0)

    applications = 2 * n_apps  # each pair = 2 half-lattice applications
    sites = lat.volume / 2
    gflops = FLOPS_PER_SITE * sites * applications / dt / 1e9

    # ideal HBM traffic per half-lattice application (f32 complex):
    # 8 links * 18 reals * 4B = 576 B + in 96 B + out 96 B per site
    bytes_per_site = (8 * 18 + 24 + 24) * 4
    bw_roofline_gflops = device_bandwidth() / bytes_per_site * FLOPS_PER_SITE / 1e9
    return {
        "gflops": gflops,
        "roofline_gflops": bw_roofline_gflops,
        "roofline_fraction": gflops / bw_roofline_gflops,
        "seconds_per_application": dt / applications,
        "dims": dims,
        "device": jax.devices()[0].device_kind,
    }


def main():
    import os

    dims = (32, 32, 32, 64)
    if jax.default_backend() == "cpu":
        dims = (8, 8, 8, 16)  # keep CPU smoke runs fast
    r = bench_dslash(dims=dims, n_apps=50 if jax.default_backend() != "cpu" else 4)
    target = 0.6 * r["roofline_gflops"]
    print(
        json.dumps(
            {
                "metric": "dslash_gflops_per_chip",
                "value": round(r["gflops"], 2),
                "unit": "GFLOP/s (1320 flops/site)",
                "vs_baseline": round(r["gflops"] / target, 4),
                "detail": {
                    "hbm_roofline_gflops": round(r["roofline_gflops"], 1),
                    "roofline_fraction": round(r["roofline_fraction"], 4),
                    "device": r["device"],
                    "lattice": list(r["dims"]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
