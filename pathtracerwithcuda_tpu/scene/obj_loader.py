"""Wavefront OBJ loader.

Fills the role of the reference's tinyobj usage (Core/triangle_mesh.cpp:8-):
per-shape (OBJ group) triangle lists so each group can get its own material
from the scene JSON's per-group material array
(Core/triangle_mesh.cpp:178,614).

Capability deltas vs the reference (both strictly more permissive):
  * polygons are fan-triangulated instead of rejected
    (reference rejects non-triangles, Core/triangle_mesh.cpp:56-63);
  * missing normals are filled with the face normal instead of rejecting
    (reference requires normals, Core/triangle_mesh.cpp:46-50).

A native C++ fast path (native/obj_loader.cpp) is used when built; this pure
Python version is the always-available fallback.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class ObjShape:
    name: str
    # (T, 3, 3) vertices, (T, 3, 3) normals, (T, 3, 2) uvs
    vertices: np.ndarray
    normals: np.ndarray
    uvs: np.ndarray

    @property
    def num_triangles(self) -> int:
        return self.vertices.shape[0]


def _parse_index(token: str, count: int) -> int:
    i = int(token)
    return i - 1 if i > 0 else count + i


def load_obj(path: str) -> "list[ObjShape]":
    """Returns one ObjShape per group encountered (in file order).

    Group boundaries follow tinyobj semantics: a new `g`/`o` line starts a new
    shape once faces exist; `usemtl` alone does not split shapes.
    """
    try:
        from pathtracerwithcuda_tpu.native import native_obj_available, native_load_obj

        if native_obj_available():
            return native_load_obj(path)
    except ImportError:
        pass
    return load_obj_python(path)


def load_obj_python(path: str) -> "list[ObjShape]":
    positions: list = []
    normals: list = []
    uvs: list = []
    shapes: list = []

    cur_name = ""
    cur_faces: list = []  # list of (vi, ti, ni) triples per triangle corner

    def flush():
        nonlocal cur_faces
        if cur_faces:
            shapes.append(_assemble(cur_name, cur_faces, positions, normals, uvs))
            cur_faces = []

    with open(path, "r", errors="replace") as f:
        for line in f:
            if not line or line[0] in "#\n":
                continue
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v" and len(parts) >= 4:
                positions.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "vn" and len(parts) >= 4:
                normals.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "vt" and len(parts) >= 3:
                uvs.append((float(parts[1]), float(parts[2])))
            elif tag in ("g", "o"):
                flush()
                cur_name = " ".join(parts[1:]) if len(parts) > 1 else ""
            elif tag == "f" and len(parts) >= 4:
                corners = []
                for tok in parts[1:]:
                    comps = tok.split("/")
                    vi = _parse_index(comps[0], len(positions))
                    ti = (
                        _parse_index(comps[1], len(uvs))
                        if len(comps) > 1 and comps[1]
                        else -1
                    )
                    ni = (
                        _parse_index(comps[2], len(normals))
                        if len(comps) > 2 and comps[2]
                        else -1
                    )
                    corners.append((vi, ti, ni))
                for k in range(1, len(corners) - 1):  # fan triangulation
                    cur_faces.append((corners[0], corners[k], corners[k + 1]))
    flush()
    return shapes


def _assemble(name, faces, positions, normals, uvs) -> ObjShape:
    t = len(faces)
    pos = np.asarray(positions, np.float32).reshape(-1, 3)
    nrm = (
        np.asarray(normals, np.float32).reshape(-1, 3)
        if normals
        else np.zeros((0, 3), np.float32)
    )
    tex = (
        np.asarray(uvs, np.float32).reshape(-1, 2)
        if uvs
        else np.zeros((0, 2), np.float32)
    )

    vi = np.array([[c[0] for c in f] for f in faces], np.int64)  # (T, 3)
    ti = np.array([[c[1] for c in f] for f in faces], np.int64)
    ni = np.array([[c[2] for c in f] for f in faces], np.int64)

    v = pos[vi]  # (T, 3, 3)

    n = np.zeros((t, 3, 3), np.float32)
    has_n = ni >= 0
    if nrm.shape[0]:
        n[has_n] = nrm[np.clip(ni, 0, nrm.shape[0] - 1)][has_n]
    if not has_n.all():
        face_n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        norm = np.linalg.norm(face_n, axis=-1, keepdims=True)
        face_n = face_n / np.maximum(norm, 1e-20)
        missing = ~has_n
        n[missing] = np.repeat(face_n[:, None, :], 3, axis=1)[missing]

    u = np.zeros((t, 3, 2), np.float32)
    has_t = ti >= 0
    if tex.shape[0]:
        u[has_t] = tex[np.clip(ti, 0, tex.shape[0] - 1)][has_t]

    return ObjShape(name=name, vertices=v.astype(np.float32), normals=n, uvs=u)
