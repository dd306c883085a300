"""Procedural example scenes (no external assets).

These mirror the reference's benchmark-relevant scene classes
(BASELINE.json configs): Cornell-style spheres, a BVH-exercising dense mesh,
microfacet metals with textures and an environment, SSS + depth of field.
All geometry/textures are generated, so benchmarks and the graft entry are
self-contained.
"""

from __future__ import annotations

import numpy as np

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.materials import builtin_materials
from pathtracerwithcuda_tpu.core.types import RenderCamera
from pathtracerwithcuda_tpu.scene.build import HostMesh, HostScene
from pathtracerwithcuda_tpu.scene.obj_loader import ObjShape


def _quad(y, half, normal_up=True):
    v = np.array(
        [
            [[-half, y, -half], [half, y, -half], [half, y, half]],
            [[-half, y, -half], [half, y, half], [-half, y, half]],
        ],
        np.float32,
    )
    n = np.zeros_like(v)
    n[..., 1] = 1.0 if normal_up else -1.0
    uv = np.array(
        [
            [[0, 0], [1, 0], [1, 1]],
            [[0, 0], [1, 1], [0, 1]],
        ],
        np.float32,
    )
    return ObjShape("quad", v, n, uv)


def torus_mesh(major=1.0, minor=0.4, seg_u=64, seg_v=48) -> ObjShape:
    """UV torus: 2 * seg_u * seg_v triangles with smooth normals + UVs."""
    u = np.linspace(0, 2 * np.pi, seg_u, endpoint=False)
    v = np.linspace(0, 2 * np.pi, seg_v, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")  # (U, V)
    cx = (major + minor * np.cos(vv)) * np.cos(uu)
    cy = minor * np.sin(vv)
    cz = (major + minor * np.cos(vv)) * np.sin(uu)
    pts = np.stack([cx, cy, cz], axis=-1).astype(np.float32)  # (U, V, 3)
    nx = np.cos(vv) * np.cos(uu)
    ny = np.sin(vv)
    nz = np.cos(vv) * np.sin(uu)
    nrm = np.stack([nx, ny, nz], axis=-1).astype(np.float32)
    tex = np.stack([uu / (2 * np.pi), vv / (2 * np.pi)], axis=-1).astype(np.float32)

    i = np.arange(seg_u)
    j = np.arange(seg_v)
    ii, jj = np.meshgrid(i, j, indexing="ij")
    i1 = (ii + 1) % seg_u
    j1 = (jj + 1) % seg_v

    def gather(arr, a, b):
        return arr[a.ravel(), b.ravel()]

    quads = []
    for arr in (pts, nrm, tex):
        c00 = gather(arr, ii, jj)
        c10 = gather(arr, i1, jj)
        c11 = gather(arr, i1, j1)
        c01 = gather(arr, ii, j1)
        t1 = np.stack([c00, c10, c11], axis=1)
        t2 = np.stack([c00, c11, c01], axis=1)
        quads.append(np.concatenate([t1, t2], axis=0))
    return ObjShape("torus", quads[0], quads[1], quads[2])


def checker_texture(n=64) -> np.ndarray:
    yy, xx = np.mgrid[0:n, 0:n]
    c = (((yy // 8) + (xx // 8)) % 2).astype(np.float32)
    img = np.stack([0.9 * c + 0.08, 0.85 * c + 0.1, 0.8 * c + 0.12], axis=-1)
    return img.astype(np.float32)


def gradient_env(length=64) -> np.ndarray:
    """Procedural 6-face environment: blue-to-white vertical gradient."""
    faces = np.zeros((6, length, length, 3), np.float32)
    t = np.linspace(1.0, 0.0, length)[:, None]  # row 0 = top (v=1)
    sky = t * np.array([0.6, 0.75, 1.0]) + (1 - t) * np.array([1.0, 1.0, 1.0])
    for f in range(6):
        faces[f] = sky[:, None, :] * (1.0 if f != 3 else 0.35)  # darker floor face
    faces[2] *= 1.2  # brighter zenith
    return np.clip(faces, 0.0, None)


def cornell_spheres_scene():
    """Config-1 class: Cornell-style diffuse+specular spheres."""
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [
        mats["wall_white"], mats["wall_red"], mats["wall_green"],
        mats["light"], mats["iron"], mats["glass"],
    ]
    host.sphere_centers = np.array(
        [
            [0, -1001.0, 0], [-1004.0, 0, 0], [1004.0, 0, 0],
            [0, 6.0, 0], [-0.9, -0.2, -0.9], [1.1, 0.0, 0.4],
        ],
        np.float32,
    )
    host.sphere_radii = np.array([1000, 1000, 1000, 2.5, 0.8, 0.9], np.float32)
    host.sphere_material_ids = np.arange(6, dtype=np.int32)
    return host


def cornell_camera(width, height):
    return RenderCamera.create(
        eye=(0.0, 1.0, 9.0), view=(0.0, 0.0, -1.0), up=(0.0, 1.0, 0.0),
        width=width, height=height, fov_x_deg=45.0,
        aperture_radius=0.0, focal_distance=9.0,
    )


def cornell_config(width=256, height=256, **kw) -> RenderConfig:
    defaults = dict(width=width, height=height, max_tracer_depth=4,
                    use_sky_box=False, use_sky=False, spp_per_pass=4)
    defaults.update(kw)
    return RenderConfig(**defaults)


def sss_dof_scene(seg_u=128, seg_v=96):
    """BASELINE config-4 class: subsurface-scattering marble torus + jade
    sphere under an area light, rendered with thin-lens depth of field."""
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["light"], mats["marble"],
                      mats["something_blue"]]
    host.meshes = [
        HostMesh.from_shapes([_quad(0.0, 12.0)], [0], (0, 0, 0), (1, 1, 1), (0, 0, 0)),
        HostMesh.from_shapes(
            [_quad(9.0, 2.5, normal_up=False)], [1], (0, 0, 0), (1, 1, 1), (0, 0, 0)
        ),
        HostMesh.from_shapes(
            [torus_mesh(1.6, 0.55, seg_u, seg_v)], [2],
            (0.0, 1.4, 0.0), (1, 1, 1), (25.0, 0.0, 15.0),
        ),
    ]
    host.sphere_centers = np.array([[2.8, 1.0, 2.2]], np.float32)
    host.sphere_radii = np.array([1.0], np.float32)
    host.sphere_material_ids = np.array([3], np.int32)
    return host


def sss_dof_camera(width, height):
    return RenderCamera.create(
        eye=(0.0, 4.5, 9.5), view=(0.0, -0.35, -0.94), up=(0.0, 1.0, 0.0),
        width=width, height=height, fov_x_deg=45.0,
        aperture_radius=0.35, focal_distance=10.0,
    )


def sss_dof_config(width=1920, height=1080, **kw) -> RenderConfig:
    # russian_roulette: SSS scatter events never kill lanes (the medium walk
    # keeps the full wavefront alive to max depth, reference event loop
    # Kernel/path_tracer_kernel.cu:456-492), so the compaction ladder never
    # shrinks; unbiased RR restores lane turnover at unchanged expectation
    # (the deliberate deviation SURVEY §7 licenses, VERDICT r3 #4)
    defaults = dict(width=width, height=height, max_tracer_depth=8,
                    use_sky_box=False, use_sky=True, spp_per_pass=4,
                    bvh_leaf_node_triangle_num=8,
                    russian_roulette=True, rr_start_depth=3)
    defaults.update(kw)
    return RenderConfig(**defaults)


def flagship_scene(seg_u=192, seg_v=172):
    """The benchmark scene: a ~66k-triangle GGX gold torus over a textured
    checker floor, a glass sphere, an area light, a procedural environment.
    Exercises BVH traversal, microfacet + refraction shading, textures and
    the cube-map sampler in one frame (configs 2+3 class)."""
    mats = builtin_materials()
    host = HostScene.empty()
    floor = dict(mats["wall_white"])
    floor["diffuse_texture_id"] = 0
    host.materials = [floor, mats["light"], mats["gold"], mats["glass"]]

    host.meshes = [
        HostMesh.from_shapes([_quad(0.0, 12.0)], [0], (0, 0, 0), (1, 1, 1), (0, 0, 0)),
        HostMesh.from_shapes(
            [_quad(9.0, 2.5, normal_up=False)], [1], (0, 0, 0), (1, 1, 1), (0, 0, 0)
        ),
        HostMesh.from_shapes(
            [torus_mesh(1.6, 0.55, seg_u, seg_v)], [2],
            (0.0, 1.4, 0.0), (1, 1, 1), (25.0, 0.0, 15.0),
        ),
    ]
    host.sphere_centers = np.array([[2.8, 1.0, 2.2]], np.float32)
    host.sphere_radii = np.array([1.0], np.float32)
    host.sphere_material_ids = np.array([3], np.int32)
    host.textures = [checker_texture()]
    host.env_faces = gradient_env()
    return host


def flagship_camera(width, height, aperture=0.0):
    return RenderCamera.create(
        eye=(0.0, 4.5, 9.5), view=(0.0, -0.35, -0.94), up=(0.0, 1.0, 0.0),
        width=width, height=height, fov_x_deg=45.0,
        aperture_radius=aperture, focal_distance=10.0,
    )


def flagship_config(width=1920, height=1080, **kw) -> RenderConfig:
    defaults = dict(
        width=width, height=height, max_tracer_depth=8,
        use_sky_box=True, use_sky=False, spp_per_pass=1,
        bvh_leaf_node_triangle_num=8,  # fewer packet steps (measured +20%)
    )
    defaults.update(kw)
    return RenderConfig(**defaults)
