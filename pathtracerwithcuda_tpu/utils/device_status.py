"""Device telemetry (reference Others/device_status.{h,cpp} NVML panel).

The reference polls NVML for utilization/memory/fan/temperature and renders
an ImGui panel.  The TPU equivalents come from JAX's device APIs and
memory_stats(); polled on an interval by the session/CLI when requested.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import jax


@dataclass
class DeviceStatus:
    poll_interval_s: float = 0.25  # reference default 250 ms (Main/window.cpp:481)
    _last_poll: float = 0.0
    _cached: dict = field(default_factory=dict)

    def tick(self) -> dict:
        """Refresh (rate-limited) and return the telemetry dict."""
        now = time.monotonic()
        if now - self._last_poll < self.poll_interval_s and self._cached:
            return self._cached
        self._last_poll = now
        self._cached = snapshot()
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
    lines.append(
        f"Topology: {info.get('num_devices')} device(s), "
        f"{info.get('num_processes')} process(es)"
    )
    return "\n".join(lines)
