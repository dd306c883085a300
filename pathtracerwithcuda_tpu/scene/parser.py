"""Scene JSON parser — reference schema compatible.

Schema per Core/scene_parser.h:56-118: optional Background (cube map
Name/Path/Format), Texture (list of image paths), Material (list of named
materials with string-encoded values), Sphere (Material/Center/Radius), Mesh
(per-group Material list, OBJ Path, Position/Scale/Rotate).  All scalar values
are *strings* in the reference files ("0.1 0.2 0.3"), and both string and
native JSON numbers are accepted here.

Validation parity (Core/scene_parser.cpp:198-230): texture ids must be in
range; a material may not be transparent with extinction > 0.

Paths in the shipped scenes use Windows separators relative to the program
root; `asset_root` plays that role and backslashes are normalized.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

import numpy as np

from pathtracerwithcuda_tpu.core.materials import builtin_materials, default_material_dict
from pathtracerwithcuda_tpu.scene.build import HostMesh, HostScene
from pathtracerwithcuda_tpu.scene.cubemap_loader import load_cube_map
from pathtracerwithcuda_tpu.scene.obj_loader import load_obj
from pathtracerwithcuda_tpu.utils.image_io import load_image_rgb

log = logging.getLogger(__name__)


class SceneParseError(ValueError):
    pass


def _f(value) -> float:
    return float(value) if not isinstance(value, str) else float(value.strip())


def _f3(value):
    if isinstance(value, str):
        parts = [float(x) for x in value.split()]
    else:
        parts = [float(x) for x in value]
    if len(parts) != 3:
        raise SceneParseError(f"expected 3 components, got {value!r}")
    return tuple(parts)


def _b(value) -> bool:
    if isinstance(value, bool):
        return value
    return str(value).strip().lower() == "true"


def _i(value) -> int:
    return int(str(value).strip())


def _resolve(asset_root: str, path: str) -> str:
    return os.path.join(asset_root, path.replace("\\", "/"))


def list_scene_files(directory: str) -> "list[str]":
    """Enumerate *.json scene files (reference set_scene_file_directory,
    Core/scene_parser.cpp:9-35)."""
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.lower().endswith(".json")
    )


def load_scene_file(path: str, asset_root: Optional[str] = None,
                    load_assets: bool = True) -> HostScene:
    """Parse one scene JSON into a HostScene.

    asset_root defaults to two levels above the scene file (matching the
    reference layout res/scene/x.json with paths like res/obj/y.obj).
    With load_assets=False, textures/cube maps/meshes are skipped (schema
    validation only).
    """
    if asset_root is None:
        asset_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(path))))
    with open(path, "r") as f:
        doc = json.load(f)

    scene = HostScene.empty()
    scene.name = os.path.splitext(os.path.basename(path))[0]

    # ---- materials: built-ins + user-declared
    named = {k: dict(v) for k, v in builtin_materials().items()}
    num_textures = len(doc.get("Texture", []))
    for m in doc.get("Material", []):
        mat = default_material_dict()
        name = m.get("Name")
        if not name:
            raise SceneParseError("material without Name")
        if "Diffuse" in m:
            mat["diffuse"] = _f3(m["Diffuse"])
        if "Emission" in m:
            mat["emission"] = _f3(m["Emission"])
        if "Specular" in m:
            mat["specular"] = _f3(m["Specular"])
        if "Transparent" in m:
            mat["transparent"] = 1.0 if _b(m["Transparent"]) else 0.0
        if "Roughness" in m:
            mat["roughness"] = _f(m["Roughness"])
        if "RefractionIndex" in m:
            mat["refraction_index"] = _f(m["RefractionIndex"])
        if "ExtinctionCoef" in m:
            mat["extinction"] = _f(m["ExtinctionCoef"])
        if "AbsorptionCoef" in m:
            mat["absorption"] = _f3(m["AbsorptionCoef"])
        if "ReducedScatteringCoef" in m:
            mat["reduced_scattering"] = _f3(m["ReducedScatteringCoef"])
        if "DiffuseTextureId" in m:
            mat["diffuse_texture_id"] = _i(m["DiffuseTextureId"])
        if "SpecularTextureId" in m:
            mat["specular_texture_id"] = _i(m["SpecularTextureId"])
        for key in ("diffuse_texture_id", "specular_texture_id"):
            tid = mat[key]
            if tid != -1 and not (0 <= tid < num_textures):
                raise SceneParseError(f"material {name}: texture id {tid} out of range")
        if mat["transparent"] > 0.5 and mat["extinction"] > 0.0:
            raise SceneParseError(f"material {name}: transparent with extinction > 0")
        named[name] = mat

    used: "dict[str, int]" = {}
    rows: "list[dict]" = []

    def material_id(name: str) -> int:
        if name not in named:
            raise SceneParseError(f"unknown material {name!r}")
        if name not in used:
            used[name] = len(rows)
            rows.append(named[name])
        return used[name]

    # ---- spheres
    centers, radii, mat_ids = [], [], []
    for s in doc.get("Sphere", []):
        centers.append(_f3(s["Center"]))
        radii.append(_f(s["Radius"]))
        mat_ids.append(material_id(s["Material"]))
    scene.sphere_centers = np.asarray(centers, np.float32).reshape(-1, 3)
    scene.sphere_radii = np.asarray(radii, np.float32).reshape(-1)
    scene.sphere_material_ids = np.asarray(mat_ids, np.int32).reshape(-1)

    # ---- meshes
    for m in doc.get("Mesh", []):
        mat_names = m["Material"]
        if isinstance(mat_names, str):
            mat_names = [mat_names]
        ids = [material_id(n) for n in mat_names]
        position = _f3(m.get("Position", "0 0 0"))
        scale = _f3(m.get("Scale", "1 1 1"))
        rotate = _f3(m.get("Rotate", "0 0 0"))
        if not load_assets:
            continue
        obj_path = _resolve(asset_root, m["Path"])
        if not os.path.isfile(obj_path):
            log.warning("mesh not found, skipping: %s", obj_path)
            continue
        shapes = load_obj(obj_path)
        if not shapes:
            log.warning("mesh has no triangles: %s", obj_path)
            continue
        scene.meshes.append(
            HostMesh.from_shapes(shapes, ids, position, scale, rotate)
        )

    # ---- textures
    if load_assets:
        for tex_path in doc.get("Texture", []):
            full = _resolve(asset_root, tex_path)
            img = load_image_rgb(full)
            if img is None:
                log.warning("texture unreadable, using white: %s", full)
                img = np.ones((1, 1, 3), np.float32)
            scene.textures.append(img)

    # ---- background cube map
    bg = doc.get("Background")
    if bg and load_assets:
        scene.env_faces = load_cube_map(
            _resolve(asset_root, bg.get("Path", "")),
            bg.get("Name", ""),
            bg.get("Format", "bmp"),
        )

    scene.materials = rows
    if not rows:
        rows.append(default_material_dict())
    return scene
