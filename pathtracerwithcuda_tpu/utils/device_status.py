"""Device telemetry (reference Others/device_status.{h,cpp} NVML panel).

The reference polls NVML for utilization/memory/clocks/fan/temperature and
renders an ImGui panel.  The TPU analogs:

* memory / topology — JAX device APIs + memory_stats() (snapshot below);
* utilization % — an accumulator the render loop feeds with device-busy
  seconds (`UtilizationTracker`), the direct analog of NVML's "percent of
  time the GPU executed a kernel in the sample window";
* clocks / throttle — TPUs expose no clock register through JAX, so
  `clock_probe` times a fixed on-device matmul and reports achieved
  GFLOP/s plus the fraction of the best value seen this process: a
  sustained fraction well below 1.0 means the chip is throttled or
  contended, which is what the NVML clock readout was for.

Fan/temperature have no TPU-side API and are reported as unavailable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp


class UtilizationTracker:
    """Device-busy fraction over a sliding window (NVML utilization analog).

    The render loop calls add_busy(seconds) after each blocking device
    dispatch; utilization() is busy-time / wall-time over the last
    `window_s` seconds, clamped to 1.0 (timing jitter can overshoot).
    """

    def __init__(self, window_s: float = 5.0):
        self.window_s = window_s
        self._start = time.monotonic()
        self._events: list = []  # (end_monotonic, busy_seconds)

    def add_busy(self, seconds: float) -> None:
        now = time.monotonic()
        self._events.append((now, seconds))
        cutoff = now - self.window_s
        while self._events and self._events[0][0] < cutoff:
            self._events.pop(0)

    def utilization(self) -> float:
        now = time.monotonic()
        cutoff = now - self.window_s
        busy = sum(s for (t, s) in self._events if t >= cutoff)
        # early in the process the window extends past tracker creation;
        # normalize by the span actually observed
        span = max(min(self.window_s, now - self._start), 1e-9)
        return min(1.0, busy / span)


_PROBE_N = 512
_probe_fn = None
_probe_best_gflops = 0.0


def clock_probe(device: Optional[jax.Device] = None) -> dict:
    """Time a fixed bf16 matmul on-device; the NVML clocks analog.

    Returns {"probe_gflops", "probe_clock_fraction"} — the fraction is
    achieved/best-seen-this-process, ~1.0 on a healthy idle chip and
    persistently lower under throttling or contention.  Costs ~a few
    hundred microseconds; DeviceStatus rate-limits it.
    """
    global _probe_fn, _probe_best_gflops
    dev = device or jax.devices()[0]
    if _probe_fn is None:
        @jax.jit
        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        a = jnp.ones((_PROBE_N, _PROBE_N), jnp.bfloat16)
        b = jnp.ones((_PROBE_N, _PROBE_N), jnp.bfloat16)
        a, b = jax.device_put((a, b), dev)
        mm(a, b).block_until_ready()  # compile outside the timed region
        _probe_fn = (mm, a, b)
    mm, a, b = _probe_fn
    t0 = time.perf_counter()
    reps = 4
    out = None
    for _ in range(reps):
        out = mm(a, b)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    gflops = 2.0 * _PROBE_N**3 / dt / 1e9
    _probe_best_gflops = max(_probe_best_gflops, gflops)
    return {
        "probe_gflops": round(gflops, 1),
        "probe_clock_fraction": round(gflops / _probe_best_gflops, 3),
    }


@dataclass
class DeviceStatus:
    poll_interval_s: float = 0.25  # reference default 250 ms (Main/window.cpp:481)
    probe_interval_s: float = 2.0  # clock probe is ~100x pricier than a poll
    utilization: UtilizationTracker = field(default_factory=UtilizationTracker)
    _last_poll: float = 0.0
    _last_probe: float = 0.0
    _probe_cache: dict = field(default_factory=dict)
    _cached: dict = field(default_factory=dict)

    def tick(self, probe: bool = True) -> dict:
        """Refresh (rate-limited) and return the telemetry dict."""
        now = time.monotonic()
        if now - self._last_poll < self.poll_interval_s and self._cached:
            return self._cached
        self._last_poll = now
        info = snapshot()
        info["utilization_pct"] = round(self.utilization.utilization() * 100)
        if probe:
            if now - self._last_probe >= self.probe_interval_s:
                self._last_probe = now
                try:
                    self._probe_cache = clock_probe()
                except Exception:  # pragma: no cover - probe is best-effort
                    self._probe_cache = {}
            info.update(self._probe_cache)
        self._cached = info
        return self._cached


def snapshot(device: Optional[jax.Device] = None) -> dict:
    dev = device or jax.devices()[0]
    info = {
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", "unknown"),
        "id": dev.id,
        "process_index": dev.process_index,
        "num_devices": len(jax.devices()),
        "num_processes": jax.process_count(),
    }
    try:
        stats = dev.memory_stats() or {}
        in_use = stats.get("bytes_in_use")
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if in_use is not None:
            info["memory_in_use_mb"] = round(in_use / 2**20, 1)
        if limit:
            info["memory_limit_mb"] = round(limit / 2**20, 1)
            if in_use is not None:
                info["memory_utilization"] = round(in_use / limit, 3)
        peak = stats.get("peak_bytes_in_use")
        if peak is not None:
            info["peak_memory_mb"] = round(peak / 2**20, 1)
    except Exception:  # memory_stats unsupported on some backends
        pass
    return info


def format_panel(info: dict) -> str:
    """Plain-text rendering of the reference's ImGui device panel."""
    lines = [f"Device: {info.get('device_kind')} ({info.get('platform')})"]
    if "memory_in_use_mb" in info:
        used = info["memory_in_use_mb"]
        limit = info.get("memory_limit_mb")
        pct = f" ({info.get('memory_utilization', 0) * 100:.0f}%)" if limit else ""
        lines.append(
            f"Memory: {used:.0f} MB" + (f" / {limit:.0f} MB{pct}" if limit else "")
        )
    if "peak_memory_mb" in info:
        lines.append(f"Peak:   {info['peak_memory_mb']:.0f} MB")
    if "utilization_pct" in info:
        lines.append(f"Util:   {info['utilization_pct']}%")
    if "probe_gflops" in info:
        lines.append(
            f"Clock probe: {info['probe_gflops']:.0f} GFLOP/s "
            f"({info.get('probe_clock_fraction', 1.0) * 100:.0f}% of best)")
    lines.append(
        f"Topology: {info.get('num_devices')} device(s), "
        f"{info.get('num_processes')} process(es)"
    )
    return "\n".join(lines)
