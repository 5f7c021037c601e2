"""Profiling / tracing hooks.

The reference has no profiler (SURVEY §5 — wall-clock AverageMeters only);
here: ``jax.profiler`` trace capture (viewable in XProf/TensorBoard), an HLO
dump hook, and a throughput meter matching the reference's samples/s logs
(train_hierarchy.py:216-223)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a device+host profile into ``log_dir`` (open with XProf)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_hlo_dump(dump_dir: str) -> None:
    """Ask XLA to dump HLO for subsequent compiles.

    Must run before the XLA backend initializes — i.e. before ANY call that
    touches devices (``jax.devices()``, ``jax.jit`` dispatch, model build) —
    XLA parses ``XLA_FLAGS`` once at backend init and later edits are
    ignored. Calling it again replaces any previous ``--xla_dump_to``."""
    os.makedirs(dump_dir, exist_ok=True)
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_dump_to=")]
    flags.append(f"--xla_dump_to={dump_dir}")
    os.environ["XLA_FLAGS"] = " ".join(flags)


class ThroughputMeter:
    """samples/s and samples/s/device over a sliding window."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events: list[tuple[float, int]] = []

    def update(self, n_samples: int) -> None:
        # monotonic: immune to NTP steps/slew over multi-day runs
        self._events.append((time.monotonic(), n_samples))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def samples_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        n = sum(c for _, c in self._events[1:])
        return n / dt if dt > 0 else 0.0

    def per_device(self, n_devices: Optional[int] = None) -> float:
        if n_devices is None:
            import jax

            n_devices = jax.device_count()
        return self.samples_per_sec / max(n_devices, 1)
