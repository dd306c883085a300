"""Native (C++) fast paths.

The reference implements its whole runtime in C++/CUDA; here the TPU compute
path is JAX/XLA/Pallas and the host runtime keeps C++ for the pieces that are
host-bound and hot at scene-load time: OBJ parsing and BVH construction.
The shared library is built on demand from native/ sources (see
native/build.py); every native entry point has a pure-Python fallback, so the
framework works without a toolchain.
"""

from __future__ import annotations

from pathtracerwithcuda_tpu.native.build import (
    native_available,
    native_obj_available,
    native_load_obj,
    native_build_sah,
    native_load_image,
)

__all__ = [
    "native_available",
    "native_obj_available",
    "native_load_obj",
    "native_build_sah",
    "native_load_image",
]
