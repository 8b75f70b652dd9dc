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
# CPU; repeated test runs on the SAME machine reuse the cached executables.
#
# The cache lives under /tmp, NOT inside the repo tree: XLA:CPU AOT entries
# embed machine code specialized to the build host, and a cache directory
# carried inside the repo snapshot travels between round machines — a
# poisoned entry then segfaults the whole pytest process inside cache
# deserialization (observed round 4: two hosts shared a flags-line
# fingerprint but not compatible AOT code).  /tmp never travels with the
# repo, so the cache is per-host by construction; the fingerprint (FULL
# cpuinfo hash, not just the flags line) additionally guards shared /tmp.
import hashlib  # noqa: E402
import tempfile  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        # drop volatile lines (cpu MHz, bogomips jitter across boots)
        _info = "".join(
            l for l in _f if not l.startswith(("cpu MHz", "bogomips"))
        )
except OSError:
    _info = "unknown"
_fp = hashlib.sha256((_info + jax.__version__).encode()).hexdigest()[:12]
_cache_dir = os.path.join(tempfile.gettempdir(), f"tmlqcd_tpu_testcache_{_fp}")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
    yield
