"""Profiling + render telemetry.

The reference's observability is printf timers around every load/build stage
(TIME_COUNT_CALL_*, Others/utilities.hpp:54-62), an FPS plot, iteration and
render-time counters (Main/window.cpp:450-479), and an NVML device panel.
TPU equivalents: wall-clock stage timers with block_until_ready fences, a
rays/sec counter derived from instrumented bounce occupancy, and
jax.profiler trace capture for deep dives.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import deque
from dataclasses import dataclass, field

import jax

log = logging.getLogger("pathtracerwithcuda_tpu")


@contextlib.contextmanager
def stage_timer(name: str, sync: bool = True):
    """`with stage_timer("bvh build"):` — prints [Info] <name>: X ms, fencing
    device work when sync=True."""
    t0 = time.perf_counter()
    yield
    if sync:
        try:
            jax.effects_barrier()
        except Exception:
            pass
    log.info("%s: %.2f ms", name, (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class FrameStats:
    """Rolling frame telemetry (the reference's FPS deque + counters)."""

    window: int = 64
    frame_ms: deque = field(default_factory=lambda: deque(maxlen=64))
    total_passes: int = 0
    start_time: float = field(default_factory=time.monotonic)

    def record(self, frame_seconds: float):
        self.frame_ms.append(frame_seconds * 1e3)
        self.total_passes += 1

    @property
    def fps(self) -> float:
        if not self.frame_ms:
            return 0.0
        mean_ms = sum(self.frame_ms) / len(self.frame_ms)
        return 1000.0 / mean_ms if mean_ms else 0.0

    @property
    def render_time_s(self) -> float:
        return time.monotonic() - self.start_time

    def summary(self) -> dict:
        return {
            "fps": round(self.fps, 2),
            "frame_ms": round(self.frame_ms[-1], 2) if self.frame_ms else None,
            "iteration": self.total_passes,
            "render_time_s": round(self.render_time_s, 2),
        }


def rays_per_second(segments_per_pass: int, seconds_per_pass: float) -> float:
    return segments_per_pass / seconds_per_pass if seconds_per_pass > 0 else 0.0
