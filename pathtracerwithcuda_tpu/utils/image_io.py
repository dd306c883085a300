"""Image I/O (fills the reference's FreeImage/lodepng/BMP-decoder roles,
Others/image_loader.cpp + Main/window.cpp:712-740)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_image_rgb(path: str) -> Optional[np.ndarray]:
    """Any-format → (H, W, 3) float32 in [0, 1]; row 0 = visual top.

    BMP/TGA (the reference's cube-map and sponza texture formats) decode
    through the native C++ decoder (native/image_decoder.cpp, the
    FreeImage role of Others/image_loader.cpp); everything else through
    PIL; a hand-rolled BMP decoder remains as the no-dependency fallback.
    """
    if path.lower().endswith((".bmp", ".tga")):
        try:
            from pathtracerwithcuda_tpu.native import native_load_image

            img = native_load_image(path)
            if img is not None:
                return img
        except Exception:  # toolchain-less install: fall through to PIL
            pass
    try:
        from PIL import Image
    except ImportError:
        return _load_bmp_fallback(path)
    try:
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.float32) / 255.0
    except Exception:
        return None


def _load_bmp_fallback(path: str) -> Optional[np.ndarray]:
    """Minimal uncompressed 24/32-bit BMP decoder (the reference ships its own,
    Others/image_loader.cpp:97-173); only used when PIL is unavailable."""
    try:
        with open(path, "rb") as f:
            data = f.read()
        if data[:2] != b"BM":
            return None
        pixel_offset = int.from_bytes(data[10:14], "little")
        width = int.from_bytes(data[18:22], "little", signed=True)
        height = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        if bpp not in (24, 32):
            return None
        flip = height > 0
        height = abs(height)
        channels = bpp // 8
        row_size = (width * channels + 3) & ~3
        out = np.zeros((height, width, 3), np.float32)
        for y in range(height):
            row = data[pixel_offset + y * row_size:][: width * channels]
            arr = np.frombuffer(row, np.uint8).reshape(width, channels)
            # BMP stores BGR, bottom-up when height > 0
            out[height - 1 - y if flip else y] = arr[:, 2::-1] / 255.0
        return out
    except Exception:
        return None


def save_png(path: str, pixels_u8: np.ndarray) -> None:
    """pixels_u8: (H, W, 3) uint8."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(pixels_u8, "RGB").save(path)


def screenshot_filename(frame_time_ms: float, spp: int, render_time_s: float,
                        width: int, height: int) -> str:
    """Metrics-encoded name matching the reference screenshot scheme
    (Main/window.cpp:728): FrameTime-…ms_SSP-…_RenderTime-…s_WxH.png."""
    return (
        f"FrameTime-{frame_time_ms:.2f}ms_SSP-{spp}_"
        f"RenderTime-{render_time_s:.2f}s_{width}x{height}.png"
    )
