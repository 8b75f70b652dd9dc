"""Checkpoint / resume: the reference's (gauge, trajectory counter, RNG
state) trio with atomic-rename durability.

Reference: survey §5.4 — state = gauge configuration (`conf.NNNN` ILDG file)
+ `nstore_counter` text file (last index + name) + RANLUX state blob;
pseudofermions/momenta are NOT checkpointed (regenerated each trajectory —
HMC is Markov).  Here the RNG "state" is just (seed, trajectory counter):
counter-based threefry makes the whole chain a pure function of those two
integers (tmlqcd_tpu.rng), which is strictly stronger than the reference's
serialized generator state.

Two formats:
  * native: .npz (gauge complex64/128 + counters) — fast, exact dtype;
  * ILDG (via io.ildg) — interoperable with any LQCD code.
Both are written tmp+rename-atomic; `resume` picks up the latest complete
set (survey §5.3: the standard posture for preemptible TPU pods).
"""

from __future__ import annotations

import json
import os

import numpy as np

from tmlqcd_tpu.io import ildg
from tmlqcd_tpu.lattice import Lattice

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint", "CheckpointInfo"]

_COUNTER_FILE = "nstore_counter"


def save_checkpoint(
    run_dir: str,
    u,
    trajectory: int,
    seed: int,
    lat: Lattice,
    fmt: str = "native",
    keep: int = 2,
    precision: int = 64,
    **meta,
) -> str:
    """Write conf.{trajectory:06d}(.npz|.lime) + nstore_counter atomically;
    prune to the newest `keep` configs (reference: Nsave cadence + nstore)."""
    from tmlqcd_tpu.parallel import gather_to_host

    os.makedirs(run_dir, exist_ok=True)
    u = gather_to_host(u)  # sharded / multi-host safe (single-host: to_host)
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        # every process gathers (collective), only rank 0 touches the fs
        name = f"conf.{trajectory:06d}." + ("npz" if fmt == "native" else "lime")
        return os.path.join(run_dir, name)
    if fmt == "native":
        name = f"conf.{trajectory:06d}.npz"
        tmp = os.path.join(run_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            np.savez(
                f,
                gauge=u,
                trajectory=np.int64(trajectory),
                seed=np.int64(seed),
                dims=np.asarray(lat.dims, np.int64),
                meta=json.dumps(meta),
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(run_dir, name))
    elif fmt == "ildg":
        name = f"conf.{trajectory:06d}.lime"
        ildg.write_gauge_field(
            os.path.join(run_dir, name), u, lat, trajectory=trajectory,
            precision=precision, **meta
        )
    else:
        raise ValueError(f"unknown checkpoint format {fmt!r}")

    tmp = os.path.join(run_dir, _COUNTER_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{trajectory} {name} {seed}\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(run_dir, _COUNTER_FILE))

    _prune(run_dir, keep)
    return os.path.join(run_dir, name)


def _prune(run_dir: str, keep: int) -> None:
    confs = sorted(
        f for f in os.listdir(run_dir) if f.startswith("conf.") and not f.endswith(".tmp")
    )
    for f in confs[:-keep] if keep > 0 else []:
        try:
            os.remove(os.path.join(run_dir, f))
        except OSError:
            pass


class CheckpointInfo:
    def __init__(self, trajectory: int, path: str, seed: int):
        self.trajectory = trajectory
        self.path = path
        self.seed = seed


def latest_checkpoint(run_dir: str) -> CheckpointInfo | None:
    """Read nstore_counter (reference: InitialStoreCounter = readin)."""
    counter = os.path.join(run_dir, _COUNTER_FILE)
    if not os.path.exists(counter):
        return None
    with open(counter) as f:
        parts = f.read().split()
    traj, name = int(parts[0]), parts[1]
    seed = int(parts[2]) if len(parts) > 2 else 0
    path = os.path.join(run_dir, name)
    if not os.path.exists(path):
        return None
    return CheckpointInfo(traj, path, seed)


def checkpoint_at(run_dir: str, trajectory: int) -> CheckpointInfo | None:
    """Find the checkpoint for a specific trajectory index (reference:
    InitialStoreCounter = N loads conf.NNNN instead of the nstore file)."""
    for ext in ("npz", "lime"):
        path = os.path.join(run_dir, f"conf.{trajectory:06d}.{ext}")
        if os.path.exists(path):
            return CheckpointInfo(trajectory, path, 0)
    return None


def load_checkpoint(path: str, expect_lat: Lattice | None = None):
    """Load a native or ILDG checkpoint -> (gauge numpy, trajectory, seed)."""
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as z:
            u = z["gauge"]
            dims = tuple(int(d) for d in z["dims"])
            if expect_lat is not None and dims != expect_lat.dims:
                raise ValueError(f"{path}: lattice {dims} != {expect_lat.dims}")
            return u, int(z["trajectory"]), int(z["seed"])
    u, hdr = ildg.read_gauge_field(path, expect_lat)
    return u, int(hdr.trajectory or 0), 0
