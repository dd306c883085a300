"""Build + ctypes bindings for the native library (placeholder until the C++
sources land; all queries report unavailable so Python fallbacks run)."""

from __future__ import annotations


def native_available() -> bool:
    return False


def native_obj_available() -> bool:
    return False


def native_load_obj(path: str):
    raise NotImplementedError


def native_build_sah(*args, **kw):
    raise NotImplementedError
