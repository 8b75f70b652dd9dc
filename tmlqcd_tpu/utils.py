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

__all__ = ["set_debug_level", "debug_printf", "timer", "trace"]

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
