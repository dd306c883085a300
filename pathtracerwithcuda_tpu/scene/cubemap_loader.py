"""Cube-map loading (reference Core/cube_map_loader.cpp:3-161).

Expects six square, equal-size faces named xpos/xneg/ypos/yneg/zpos/zneg with
a common format in a directory.  Returns (6, L, L, 3) float32 in [0, 1], face
order matching convert_xyz_to_cube_uv (0:+x 1:-x 2:+y 3:-y 4:+z 5:-z); row 0
is the visual top of the face image (v = 1).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

from pathtracerwithcuda_tpu.utils.image_io import load_image_rgb

log = logging.getLogger(__name__)

FACE_NAMES = ("xpos", "xneg", "ypos", "yneg", "zpos", "zneg")


def load_cube_map(root: str, name: str, fmt: str) -> Optional[np.ndarray]:
    """root/name/<face>.<fmt> for each of the six faces.

    Returns None (with a warning) if any face is missing or sizes mismatch —
    the reference logs and renders without a skybox in that case.
    """
    folder = os.path.join(root, name)
    faces = []
    for face in FACE_NAMES:
        path = os.path.join(folder, f"{face}.{fmt}")
        if not os.path.isfile(path):
            log.warning("cube map face missing: %s", path)
            return None
        img = load_image_rgb(path)
        if img is None:
            log.warning("cube map face unreadable: %s", path)
            return None
        faces.append(img)
    h0, w0 = faces[0].shape[:2]
    if h0 != w0 or any(f.shape[:2] != (h0, w0) for f in faces):
        log.warning("cube map faces must be equal squares (%s)", folder)
        return None
    return np.stack(faces, axis=0).astype(np.float32)
