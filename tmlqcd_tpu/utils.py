"""Runtime utilities: leveled debug logging, wall timers, profiling hooks.

Reference: tm_debug_printf.c (`tm_debug_printf(proc, level, ...)` gated by
g_debug_level / input key DebugLevel), gettime.c (`gettime()`), and the
per-phase timing the reference prints around trajectories and solves
(survey §5.1/§5.5).  `trace` wraps jax.profiler for TPU traces — the
replacement for the reference's manual benchmark instrumentation.
"""

from __future__ import annotations

import contextlib
import os
import time

__all__ = [
    "set_debug_level",
    "debug_printf",
    "timer",
    "trace",
    "enable_persistent_compile_cache",
]

_DEBUG_LEVEL = int(os.environ.get("TMLQCD_TPU_DEBUG", "1"))


def set_debug_level(level: int) -> None:
    """Reference: DebugLevel input key -> g_debug_level."""
    global _DEBUG_LEVEL
    _DEBUG_LEVEL = int(level)


def debug_printf(level: int, fmt: str, *args) -> None:
    """Print when the configured level is >= `level`
    (reference: tm_debug_printf; process gating is moot — single controller)."""
    if _DEBUG_LEVEL >= level:
        print(fmt % args if args else fmt, flush=True)


@contextlib.contextmanager
def timer(label: str, level: int = 2):
    """Wall-clock a block (reference: gettime() bracketing); prints at the
    given debug level.  NOTE: callers must block_until_ready inside the
    block for on-device work to be attributed correctly."""
    t0 = time.perf_counter()
    yield
    debug_printf(level, "# %s: %.3f s", label, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tmlqcd_tpu_trace"):
    """jax.profiler trace around a block — open with xprof/tensorboard
    (the TPU-native replacement of the reference's benchmark timers)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def to_host(x):
    """Device -> host numpy, safe for complex arrays.

    The axon remote-TPU transport cannot transfer complex buffers
    (UNIMPLEMENTED); complex arrays are staged as a stacked (re, im) float
    pair on-device and recombined on the host.  Real arrays pass through.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating):
        ri = jax.jit(lambda v: jnp.stack([jnp.real(v), jnp.imag(v)]))(x)
        a = np.asarray(ri)
        return np.ascontiguousarray(a[0] + 1j * a[1])
    return np.asarray(x)


def enable_persistent_compile_cache(cache_dir: str | None = None) -> None:
    """Point jax's persistent compilation cache at a repo-local directory so
    driver entry points (bench, hmc, invert) don't pay the cold-XLA cost on
    every invocation (first 32^3x64 kernel compile through the remote TPU
    tunnel is minutes; cached reruns are instant).  No-op if already set."""
    import jax

    if cache_dir is None:
        import tmlqcd_tpu

        root = os.path.dirname(os.path.dirname(os.path.abspath(tmlqcd_tpu.__file__)))
        cache_dir = os.path.join(root, ".jax_cache_tpu")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
