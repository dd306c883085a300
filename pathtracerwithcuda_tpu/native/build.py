"""Build + ctypes bindings for the native host library.

The TPU compute path is JAX/XLA/Pallas; the runtime keeps C++ for the
host-bound pieces that gate interactive scene loads and edit-rebuilds (the
reference's whole runtime is C++ — Core/triangle_mesh.cpp, Bvh/bvh.cpp):

  * ptc_obj_*   — OBJ parsing (obj_loader.cpp)
  * ptc_bvh_*   — bucketed-SAH BVH build with leaf-contiguous permutation
                  (bvh_builder.cpp); ~1000x the Python builder's speed

Compiled on demand with g++ into libptc_native.so next to the sources.
Every entry point has a pure-Python fallback, so a missing toolchain only
costs speed.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libptc_native.so")
_SOURCES = ["bvh_builder.cpp", "obj_loader.cpp", "image_decoder.cpp"]

_lock = threading.Lock()
_lib = None
_tried = False


def _sources_mtime() -> float:
    return max(os.path.getmtime(os.path.join(_DIR, s)) for s in _SOURCES)


def _load() -> "ctypes.CDLL | None":
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            stale = (
                not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < _sources_mtime()
            )
            if stale:
                cmd = [
                    "g++", "-O3", "-march=native", "-fPIC", "-shared",
                    "-std=c++17", "-o", _LIB_PATH,
                ] + [os.path.join(_DIR, s) for s in _SOURCES]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            _declare(lib)
            _lib = lib
        except Exception as e:  # missing toolchain, sandbox, etc.
            log.info("native library unavailable (%s); using Python fallbacks", e)
            _lib = None
        return _lib


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.ptc_bvh_build.restype = c.c_void_p
    lib.ptc_bvh_build.argtypes = [c.c_void_p, c.c_int64, c.c_int, c.c_int]
    lib.ptc_bvh_num_nodes.restype = c.c_int64
    lib.ptc_bvh_num_nodes.argtypes = [c.c_void_p]
    lib.ptc_bvh_fill.restype = None
    lib.ptc_bvh_fill.argtypes = [c.c_void_p] + [c.c_void_p] * 6
    lib.ptc_bvh_free.restype = None
    lib.ptc_bvh_free.argtypes = [c.c_void_p]

    lib.ptc_obj_load.restype = c.c_void_p
    lib.ptc_obj_load.argtypes = [c.c_char_p]
    lib.ptc_obj_num_shapes.restype = c.c_int32
    lib.ptc_obj_num_shapes.argtypes = [c.c_void_p]
    lib.ptc_obj_shape_tris.restype = c.c_int64
    lib.ptc_obj_shape_tris.argtypes = [c.c_void_p, c.c_int32]
    lib.ptc_obj_shape_name.restype = None
    lib.ptc_obj_shape_name.argtypes = [c.c_void_p, c.c_int32, c.c_char_p, c.c_int32]
    lib.ptc_obj_fill.restype = None
    lib.ptc_obj_fill.argtypes = [c.c_void_p, c.c_int32] + [c.c_void_p] * 3
    lib.ptc_obj_free.restype = None
    lib.ptc_obj_free.argtypes = [c.c_void_p]

    lib.ptc_img_load.restype = c.c_void_p
    lib.ptc_img_load.argtypes = [c.c_char_p]
    lib.ptc_img_width.restype = c.c_int32
    lib.ptc_img_width.argtypes = [c.c_void_p]
    lib.ptc_img_height.restype = c.c_int32
    lib.ptc_img_height.argtypes = [c.c_void_p]
    lib.ptc_img_fill.restype = None
    lib.ptc_img_fill.argtypes = [c.c_void_p, c.c_void_p]
    lib.ptc_img_free.restype = None
    lib.ptc_img_free.argtypes = [c.c_void_p]


def native_available() -> bool:
    return _load() is not None


def native_obj_available() -> bool:
    return native_available()


def native_load_obj(path: str):
    """list[ObjShape] via the C++ parser (contract of obj_loader.load_obj)."""
    from pathtracerwithcuda_tpu.scene.obj_loader import ObjShape

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h = lib.ptc_obj_load(path.encode())
    if not h:
        return []
    try:
        shapes = []
        for s in range(lib.ptc_obj_num_shapes(h)):
            t = lib.ptc_obj_shape_tris(h, s)
            name_buf = ctypes.create_string_buffer(256)
            lib.ptc_obj_shape_name(h, s, name_buf, 256)
            v = np.empty((t, 3, 3), np.float32)
            n = np.empty((t, 3, 3), np.float32)
            uv = np.empty((t, 3, 2), np.float32)
            lib.ptc_obj_fill(
                h, s,
                v.ctypes.data_as(ctypes.c_void_p),
                n.ctypes.data_as(ctypes.c_void_p),
                uv.ctypes.data_as(ctypes.c_void_p),
            )
            shapes.append(
                ObjShape(name=name_buf.value.decode(errors="replace"),
                         vertices=v, normals=n, uvs=uv)
            )
        return shapes
    finally:
        lib.ptc_obj_free(h)


def native_build_sah(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                     leaf_size: int = 4, num_buckets: int = 12):
    """(FlatBVH with leaf-contiguous slots, permutation) via the C++ builder.

    Contract matches build_sah.build_sah_bvh + flatten.permute_leaf_contiguous.
    """
    from pathtracerwithcuda_tpu.bvh.flatten import FlatBVH

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    t = v0.shape[0]
    tris = np.ascontiguousarray(
        np.stack([v0, v1, v2], axis=1).reshape(t, 9), np.float32
    )
    h = lib.ptc_bvh_build(
        tris.ctypes.data_as(ctypes.c_void_p), t, leaf_size, num_buckets
    )
    if not h:
        return FlatBVH.empty(leaf_size), np.zeros((0,), np.int64)
    try:
        n = lib.ptc_bvh_num_nodes(h)
        node_min = np.empty((n, 3), np.float32)
        node_max = np.empty((n, 3), np.float32)
        nxt = np.empty((n,), np.int32)
        start = np.empty((n,), np.int32)
        count = np.empty((n,), np.int32)
        perm = np.empty((t,), np.int64)
        lib.ptc_bvh_fill(
            h,
            node_min.ctypes.data_as(ctypes.c_void_p),
            node_max.ctypes.data_as(ctypes.c_void_p),
            nxt.ctypes.data_as(ctypes.c_void_p),
            start.ctypes.data_as(ctypes.c_void_p),
            count.ctypes.data_as(ctypes.c_void_p),
            perm.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.ptc_bvh_free(h)
    slots = -np.ones((n, leaf_size), np.int32)
    cols = np.arange(leaf_size)[None, :]
    mask = cols < count[:, None]
    slots[mask] = (start[:, None] + cols)[mask]
    bvh = FlatBVH(node_min=node_min, node_max=node_max, next_index=nxt,
                  tri_slots=slots)
    return bvh, perm


def native_load_image(path: str):
    """(H, W, 3) float32 RGB in [0, 1], row 0 = top — C++ BMP/TGA decoder
    (image_decoder.cpp; the reference's FreeImage role).  None if the
    library is unavailable or the file isn't a supported BMP/TGA."""
    lib = _load()
    if lib is None:
        return None
    h = lib.ptc_img_load(path.encode())
    if not h:
        return None
    try:
        w = lib.ptc_img_width(h)
        ht = lib.ptc_img_height(h)
        out = np.empty((ht, w, 3), np.float32)
        lib.ptc_img_fill(h, out.ctypes.data_as(ctypes.c_void_p))
    finally:
        lib.ptc_img_free(h)
    return out
