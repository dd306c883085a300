"""Golden tests: the wavefront renderer vs the scalar NumPy oracle, fed the
same uniform random numbers (the reference's dual-backend cross-check,
Core/path_tracer.cpp:46-91, recreated as an automated test)."""

import jax
import numpy as np
import pytest

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.materials import builtin_materials
from pathtracerwithcuda_tpu.core.types import RenderCamera
from pathtracerwithcuda_tpu.ops import rng
from pathtracerwithcuda_tpu.render.wavefront import trace_radiance
from pathtracerwithcuda_tpu.scene.build import HostMesh, HostScene, build_scene_data
from tests import oracle


def _camera_dict(cam: RenderCamera):
    return {
        "eye": np.asarray(cam.eye),
        "view": np.asarray(cam.view),
        "up": np.asarray(cam.up),
        "resolution": np.asarray(cam.resolution),
        "fov": np.asarray(cam.fov),
        "aperture_radius": float(cam.aperture_radius),
        "focal_distance": float(cam.focal_distance),
    }


def _uniforms(config, key):
    import jax.numpy as jnp

    pids = jnp.arange(config.pixel_count, dtype=jnp.int32)
    raygen_u = np.asarray(rng.raygen_uniforms(key, pids), np.float64)
    bounce_u = np.stack(
        [np.asarray(rng.bounce_uniforms(key, d, pids), np.float64)
         for d in range(config.max_tracer_depth)]
    )
    rr_u = None
    if config.russian_roulette:
        rr_u = np.stack(
            [np.asarray(rng.rr_uniforms(key, d, pids), np.float64)
             for d in range(config.max_tracer_depth)]
        )
    return raygen_u, bounce_u, rr_u


def _oracle_scene(host: HostScene, scene_data):
    out = {
        "materials": host.materials,
        "sphere_center": host.sphere_centers.astype(np.float64),
        "sphere_radius": host.sphere_radii.astype(np.float64),
        "sphere_material": host.sphere_material_ids,
        "env_faces": host.env_faces,
        "textures": host.textures,
    }
    if scene_data.num_triangles:
        out["triangles"] = {
            "v0": np.asarray(scene_data.tri_v0, np.float64),
            "v1": np.asarray(scene_data.tri_v1, np.float64),
            "v2": np.asarray(scene_data.tri_v2, np.float64),
            "n0": np.asarray(scene_data.tri_n0, np.float64),
            "n1": np.asarray(scene_data.tri_n1, np.float64),
            "n2": np.asarray(scene_data.tri_n2, np.float64),
            "uv0": np.asarray(scene_data.tri_uv0, np.float64),
            "uv1": np.asarray(scene_data.tri_uv1, np.float64),
            "uv2": np.asarray(scene_data.tri_uv2, np.float64),
            "material": np.asarray(scene_data.tri_material),
        }
    return out


def _compare(host, config, camera_override=None, seed=0, tol=2e-2, frac=0.02):
    scene = build_scene_data(host, config)
    cam = camera_override or RenderCamera.create(
        eye=(0.0, 1.0, 8.0), view=(0.0, 0.0, -1.0), up=(0.0, 1.0, 0.0),
        width=config.width, height=config.height, fov_x_deg=45.0,
        focal_distance=8.0,
    )
    key = rng.pass_key(jax.random.PRNGKey(seed), 0)
    radiance = np.asarray(trace_radiance(scene, cam, config, key))
    raygen_u, bounce_u, rr_u = _uniforms(config, key)
    expected = oracle.render(_oracle_scene(host, scene), _camera_dict(cam), config,
                             raygen_u, bounce_u, rr_u)
    # float32 vs float64 along chaotic paths: allow a small fraction of
    # pixels to diverge (decision boundaries), the rest must match closely
    err = np.abs(radiance - expected).max(axis=-1)
    bad = (err > tol).mean()
    assert bad <= frac, f"{bad:.3%} pixels deviate by more than {tol} (max {err.max():.4f})"
    return radiance, expected


def _cornell_spheres(**cfg_kw):
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [
        mats["wall_white"], mats["wall_red"], mats["wall_green"],
        mats["light"], mats["iron"], mats["glass"],
    ]
    c = np.array(
        [
            [0, -1001.0, 0],  # floor
            [-1003.0, 0, 0],  # left wall
            [1003.0, 0, 0],  # right wall
            [0, 1005.0, 0],  # light high above
            [-0.9, 0, -0.9],
            [1.1, 0.2, 0.4],
        ],
        np.float32,
    )
    host.sphere_centers = c
    host.sphere_radii = np.array([1000, 1000, 1000, 1001.5, 0.8, 0.7], np.float32)
    host.sphere_material_ids = np.array([0, 1, 2, 3, 4, 5], np.int32)
    config = RenderConfig(
        width=24, height=18, max_tracer_depth=4, use_sky_box=False, use_sky=True,
        **cfg_kw,
    )
    return host, config


def test_spheres_scene_matches_oracle():
    _compare(*_cornell_spheres())


def test_spheres_no_aa_no_sky():
    host, config = _cornell_spheres()
    config = config.replace(use_anti_alias=False, use_sky=False)
    _compare(host, config)


def test_mesh_scene_matches_oracle(rng_np):
    """Two quads + a small random mesh, brute-force sized."""
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["light"], mats["copper"]]

    def quad(y, half, mat):
        v = np.array(
            [
                [[-half, y, -half], [half, y, -half], [half, y, half]],
                [[-half, y, -half], [half, y, half], [-half, y, half]],
            ],
            np.float32,
        )
        n = np.zeros_like(v)
        n[..., 1] = 1.0
        from pathtracerwithcuda_tpu.scene.obj_loader import ObjShape

        return ObjShape("q", v, n, np.zeros((2, 3, 2), np.float32)), mat

    floor, m0 = quad(-1.0, 6.0, 0)
    lamp, m1 = quad(4.0, 1.5, 1)
    # flip lamp to face down
    lamp.normals = -lamp.normals
    host.meshes = [
        HostMesh.from_shapes([floor], [m0], (0, 0, 0), (1, 1, 1), (0, 0, 0)),
        HostMesh.from_shapes([lamp], [m1], (0, 0, 0), (1, 1, 1), (0, 0, 0)),
    ]
    host.sphere_centers = np.array([[0.0, 0.0, 0.0]], np.float32)
    host.sphere_radii = np.array([0.8], np.float32)
    host.sphere_material_ids = np.array([2], np.int32)
    config = RenderConfig(width=20, height=16, max_tracer_depth=4,
                          use_sky_box=False, use_sky=True)
    _compare(host, config)


def test_bvh_mesh_matches_oracle(rng_np):
    """A mesh big enough to force the BVH path; compare vs oracle brute force."""
    from pathtracerwithcuda_tpu.scene.obj_loader import ObjShape

    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["light"]]

    n = 200  # > BRUTE_FORCE_MAX_TRIS → BVH used
    base = rng_np.uniform(-3, 3, (n, 1, 3))
    tri = (base + rng_np.normal(size=(n, 3, 3)) * 0.3).astype(np.float32)
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    nrm = np.repeat(nrm[:, None, :], 3, axis=1).astype(np.float32)
    shape = ObjShape("blob", tri, nrm, np.zeros((n, 3, 2), np.float32))
    host.meshes = [HostMesh.from_shapes([shape], [0], (0, 0, 0), (1, 1, 1), (0, 0, 0))]
    host.sphere_centers = np.array([[0.0, 8.0, 0.0]], np.float32)
    host.sphere_radii = np.array([2.0], np.float32)
    host.sphere_material_ids = np.array([1], np.int32)

    config = RenderConfig(width=16, height=12, max_tracer_depth=3,
                          use_sky_box=False, use_sky=True, chunk_size=64)
    _compare(host, config)


def test_dof_and_transparency():
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["glass"], mats["light"]]
    host.sphere_centers = np.array(
        [[0, -1001.0, 0], [0, 0, 0], [0, 1004.0, 0]], np.float32
    )
    host.sphere_radii = np.array([1000.0, 1.0, 1000.5], np.float32)
    host.sphere_material_ids = np.array([0, 1, 2], np.int32)
    config = RenderConfig(width=16, height=12, max_tracer_depth=5,
                          use_sky_box=False, use_sky=True)
    cam = RenderCamera.create(
        eye=(0.0, 1.0, 8.0), view=(0.0, 0.0, -1.0), up=(0.0, 1.0, 0.0),
        width=config.width, height=config.height, fov_x_deg=45.0,
        aperture_radius=0.3, focal_distance=8.0,
    )
    _compare(host, config, camera_override=cam, frac=0.05)


def test_sss_medium():
    """Marble-like SSS sphere: medium random walk must match the oracle."""
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["marble"], mats["light"]]
    host.sphere_centers = np.array(
        [[0, -1001.0, 0], [0, 0, 0], [0, 1004.0, 0]], np.float32
    )
    host.sphere_radii = np.array([1000.0, 1.0, 1000.5], np.float32)
    host.sphere_material_ids = np.array([0, 1, 2], np.int32)
    config = RenderConfig(width=14, height=10, max_tracer_depth=6,
                          use_sky_box=False, use_sky=True)
    _compare(host, config, frac=0.08)  # long chaotic walks → more boundary pixels


def test_sss_medium_russian_roulette():
    """Same SSS scene with unbiased Russian roulette ON: the integrator's RR
    (survival uniforms from the separate STAGE_RR stream) must replay exactly
    in the oracle — the lane-lifetime fix for SSS wavefronts (VERDICT r3 #4)."""
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["marble"], mats["light"]]
    host.sphere_centers = np.array(
        [[0, -1001.0, 0], [0, 0, 0], [0, 1004.0, 0]], np.float32
    )
    host.sphere_radii = np.array([1000.0, 1.0, 1000.5], np.float32)
    host.sphere_material_ids = np.array([0, 1, 2], np.int32)
    config = RenderConfig(width=14, height=10, max_tracer_depth=6,
                          use_sky_box=False, use_sky=True,
                          russian_roulette=True, rr_start_depth=2)
    _compare(host, config, frac=0.08)


def test_textured_skybox_matches_oracle():
    """Integrator-path coverage of textures AND the cube-map background
    (bounce_step's sample_atlas + skybox branches, reference
    Kernel/path_tracer_kernel.cu:518-526 + :618-624): a checker-textured
    floor mesh under a gradient environment map."""
    from pathtracerwithcuda_tpu.scene.examples import checker_texture, gradient_env
    from pathtracerwithcuda_tpu.scene.obj_loader import ObjShape

    mats = builtin_materials()
    host = HostScene.empty()
    floor_mat = dict(mats["wall_white"])
    floor_mat["diffuse_texture_id"] = 0
    floor_mat["specular_texture_id"] = 1
    host.materials = [floor_mat, dict(mats["glass"])]

    half = 6.0
    v = np.array(
        [
            [[-half, -1.0, -half], [half, -1.0, -half], [half, -1.0, half]],
            [[-half, -1.0, -half], [half, -1.0, half], [-half, -1.0, half]],
        ],
        np.float32,
    )
    n = np.zeros_like(v)
    n[..., 1] = 1.0
    uv = np.array(
        [
            [[0, 0], [4, 0], [4, 4]],
            [[0, 0], [4, 4], [0, 4]],  # uv > 1 exercises wrap
        ],
        np.float32,
    )
    floor = ObjShape("floor", v, n, uv)
    # glass cube: refraction through MESH geometry (not spheres)
    import os

    cube_path = os.path.join(os.path.dirname(__file__), "..", "assets", "obj",
                             "cube.obj")
    from pathtracerwithcuda_tpu.scene.obj_loader import load_obj_python

    cube = load_obj_python(cube_path)
    host.meshes = [
        HostMesh.from_shapes([floor], [0], (0, 0, 0), (1, 1, 1), (0, 0, 0)),
        HostMesh.from_shapes(cube, [1], (0.0, 0.2, 0.0), (0.9, 0.9, 0.9),
                             (0, 30, 0)),
    ]
    host.textures = [checker_texture(16), np.full((8, 8, 3), 0.9, np.float32)]
    host.env_faces = gradient_env(16)

    config = RenderConfig(width=24, height=18, max_tracer_depth=5,
                          use_sky_box=True, use_sky=False, use_bilinear=True)
    scene = build_scene_data(host, config)
    assert scene.textures.count == 2 and bool(scene.has_env_map)
    _compare(host, config, frac=0.05)


def test_textured_nearest_no_bilinear():
    """Same texture machinery with nearest-neighbour sampling
    (config.use_bilinear=False, reference Core/texture.h:22-40)."""
    from pathtracerwithcuda_tpu.scene.examples import checker_texture
    from pathtracerwithcuda_tpu.scene.obj_loader import ObjShape

    mats = builtin_materials()
    host = HostScene.empty()
    floor_mat = dict(mats["wall_white"])
    floor_mat["diffuse_texture_id"] = 0
    host.materials = [floor_mat, dict(mats["light"])]
    v = np.array(
        [
            [[-5.0, -1.0, -5.0], [5.0, -1.0, -5.0], [5.0, -1.0, 5.0]],
            [[-5.0, -1.0, -5.0], [5.0, -1.0, 5.0], [-5.0, -1.0, 5.0]],
        ],
        np.float32,
    )
    n = np.zeros_like(v)
    n[..., 1] = 1.0
    uv = np.array(
        [[[0, 0], [2, 0], [2, 2]], [[0, 0], [2, 2], [0, 2]]], np.float32
    )
    host.meshes = [
        HostMesh.from_shapes([ObjShape("floor", v, n, uv)], [0],
                             (0, 0, 0), (1, 1, 1), (0, 0, 0)),
    ]
    host.sphere_centers = np.array([[0.0, 6.0, 0.0]], np.float32)
    host.sphere_radii = np.array([2.0], np.float32)
    host.sphere_material_ids = np.array([1], np.int32)
    host.textures = [checker_texture(8)]
    config = RenderConfig(width=16, height=12, max_tracer_depth=3,
                          use_sky_box=False, use_sky=True, use_bilinear=False)
    _compare(host, config)
