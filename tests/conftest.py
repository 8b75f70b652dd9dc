"""Test harness: force CPU with 8 virtual devices.

This is the TPU analog of the reference's `mpirun -np 8` on one box
(test/check_xchange.c strategy, survey §4): sharded-vs-unsharded equality
tests run on a virtual 8-device mesh without real hardware.

Must run before jax initializes any backend; the axon TPU plugin force-adds
itself to jax_platforms at import, so we both set the env var and override
the config explicitly.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CG/HMC while-loops take minutes to compile on
# CPU; repeated test runs reuse the cached executables.  Keyed by a CPU-feature
# fingerprint: XLA:CPU AOT entries embed machine code specialized to the build
# host, and loading one on a host with different features warns loudly and can
# SIGILL (observed across round machines).
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next(l for l in _f if l.startswith("flags"))
except (OSError, StopIteration):
    _flags = "unknown"
_fp = hashlib.sha256((_flags + jax.__version__).encode()).hexdigest()[:12]
_cache_dir = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), f".jax_cache_{_fp}"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
    yield
