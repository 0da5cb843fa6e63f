"""Profiling facade: device timers + trace capture.

Parity: reference `curobo/profiling.py` (`CudaEventTimer`,
`record_function` annotations). The TPU equivalents: a blocking
wall-clock device timer (`DeviceTimer` — the CudaEventTimer analog; on
TPU "event" timing IS wall time around `block_until_ready`), the
`jax.profiler` trace context for XLA/TensorBoard captures, and
`jax.named_scope` re-exported for annotating hot regions (the package
already annotates solver/rollout/cost boundaries with it).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

named_scope = jax.named_scope


class DeviceTimer:
    """Wall-clock timer that synchronizes the device at start/stop.

    with DeviceTimer() as t:
        out = solve(...)
        t.sync(out)          # block on the result before stopping
    print(t.elapsed_ms)
    """

    def __init__(self):
        self.elapsed_ms: Optional[float] = None
        self._t0: Optional[float] = None
        self._out = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sync(self, out):
        self._out = out
        return out

    def __exit__(self, *exc):
        if self._out is not None:
            jax.block_until_ready(self._out)
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1000.0
        return False


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named scope visible in profiler traces (record_function analog)."""
    with jax.named_scope(name):
        yield
