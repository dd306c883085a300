"""Core SoA data model.

The reference stores AoS structs with device pointers (triangle{v0..uv2,mat*}
Core/triangle.h:11-25, sphere{center,radius,mat} Core/sphere.h:11-16,
material Core/material.h:49-78).  The TPU design is structure-of-arrays
pytrees: geometry as ``(N, …)`` float arrays, materials as an ``(M, k)``
parameter table indexed by integer id.  Material parameters are ordinary
pytree leaves, which is what makes them differentiable.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@flax.struct.dataclass
class MaterialTable:
    """Differentiable material parameter table (reference Core/material.h:49-78).

    Conductors are rows with extinction > 0; dielectrics otherwise
    (Core/material.h:12-15).  ``transparent`` is stored as float {0,1} so the
    table remains a uniform dtype pytree; it is *not* a differentiable
    quantity and is compared against 0.5 where a bool is needed.
    """

    diffuse: Array  # (M, 3)
    emission: Array  # (M, 3)
    specular: Array  # (M, 3)
    transparent: Array  # (M,) float {0,1}
    roughness: Array  # (M,)
    refraction_index: Array  # (M,)
    extinction: Array  # (M,)
    absorption: Array  # (M, 3)   medium absorption sigma_a
    reduced_scattering: Array  # (M, 3)   medium sigma_s'
    diffuse_texture_id: Array  # (M,) int32, -1 = none
    specular_texture_id: Array  # (M,) int32, -1 = none

    @property
    def count(self) -> int:
        return self.diffuse.shape[0]

    @staticmethod
    def from_rows(rows: "list[dict]") -> "MaterialTable":
        """Build from a list of plain dicts (see core.materials.builtin())."""
        if not rows:
            # one default row so gathers always have a target
            from pathtracerwithcuda_tpu.core.materials import default_material_dict

            rows = [default_material_dict()]
        f32 = lambda k, d: jnp.asarray(np.array([r.get(k, d) for r in rows], np.float32))
        i32 = lambda k, d: jnp.asarray(np.array([r.get(k, d) for r in rows], np.int32))
        return MaterialTable(
            diffuse=f32("diffuse", (0, 0, 0)),
            emission=f32("emission", (0, 0, 0)),
            specular=f32("specular", (0, 0, 0)),
            transparent=f32("transparent", 0.0),
            roughness=f32("roughness", 0.0),
            refraction_index=f32("refraction_index", 1.0),
            extinction=f32("extinction", 0.0),
            absorption=f32("absorption", (0, 0, 0)),
            reduced_scattering=f32("reduced_scattering", (0, 0, 0)),
            diffuse_texture_id=i32("diffuse_texture_id", -1),
            specular_texture_id=i32("specular_texture_id", -1),
        )


@flax.struct.dataclass
class TextureAtlas:
    """All 2D textures packed into one flat RGB f32 table.

    The reference keeps per-texture uchar RGBA buffers and samples them with
    4-tap bilinear gathers (Core/texture.h:15-79).  On TPU, variable-size
    per-texture buffers would defeat static shapes, so every texture is
    row-major flattened into one ``(total_texels, 3)`` float array with
    per-texture (offset, width, height) lookup tables.  Gathers hit this one
    array regardless of which texture a lane needs.
    """

    data: Array  # (total_texels, 3) f32 in [0,1]
    offset: Array  # (T,) int32  — start index into data
    width: Array  # (T,) int32
    height: Array  # (T,) int32

    @property
    def count(self) -> int:
        return self.offset.shape[0]

    @staticmethod
    def empty() -> "TextureAtlas":
        return TextureAtlas(
            data=jnp.zeros((1, 3), jnp.float32),
            offset=jnp.zeros((1,), jnp.int32),
            width=jnp.ones((1,), jnp.int32),
            height=jnp.ones((1,), jnp.int32),
        )

    @staticmethod
    def pack(images: "list[np.ndarray]") -> "TextureAtlas":
        """images: list of (H, W, 3) float32 arrays in [0,1]."""
        if not images:
            return TextureAtlas.empty()
        offsets, flats, ws, hs = [], [], [], []
        cursor = 0
        for img in images:
            h, w = img.shape[:2]
            offsets.append(cursor)
            ws.append(w)
            hs.append(h)
            flats.append(np.asarray(img[..., :3], np.float32).reshape(-1, 3))
            cursor += h * w
        return TextureAtlas(
            data=jnp.asarray(np.concatenate(flats, axis=0)),
            offset=jnp.asarray(np.array(offsets, np.int32)),
            width=jnp.asarray(np.array(ws, np.int32)),
            height=jnp.asarray(np.array(hs, np.int32)),
        )


@flax.struct.dataclass
class SceneData:
    """Device scene: geometry + BVH + materials + environment, all SoA.

    Triangle vertices are stored *world-space* (mesh Position/Scale/Rotate
    already applied, as the reference does at device upload —
    Core/triangle_mesh.cpp:615-647 and rotation baked at load :147-166).

    The BVH is the reference's flattened skip-link layout
    (Bvh/bvh.cpp:244-330): preorder node order; ``bvh_next[i]`` is the
    traversal index to jump to when node i's AABB is missed; descending into a
    hit internal node is just ``i + 1``.  All per-mesh BVHs are concatenated —
    the skip chain of mesh k ends exactly at mesh k+1's root, which subsumes
    the reference's sequential per-mesh loop (Kernel/path_tracer_kernel.cu:443-454)
    into a single walk.  ``bvh_tri[i]`` holds up to K triangle indices for leaf
    nodes, padded with -1 (internal nodes are all -1).
    """

    # spheres
    sphere_center: Array  # (S, 3)
    sphere_radius: Array  # (S,)
    sphere_material: Array  # (S,) int32

    # triangles (world space)
    tri_v0: Array  # (T, 3)
    tri_v1: Array
    tri_v2: Array
    tri_n0: Array  # (T, 3) shading normals
    tri_n1: Array
    tri_n2: Array
    tri_uv0: Array  # (T, 2)
    tri_uv1: Array
    tri_uv2: Array
    tri_material: Array  # (T,) int32

    # flattened skip-link BVH over all meshes; triangles are stored in
    # leaf-contiguous order (bvh.flatten.permute_leaf_contiguous), so a
    # leaf's triangles are the run [bvh_tri_start, bvh_tri_start + count)
    bvh_min: Array  # (N, 3)
    bvh_max: Array  # (N, 3)
    bvh_next: Array  # (N,) int32  skip link
    bvh_tri: Array  # (N, K) int32  leaf triangle slots, -1 padded
    bvh_tri_start: Array  # (N,) int32  first triangle of leaf run, -1 internal
    bvh_tri_count: Array  # (N,) int32  run length (0 for internal nodes)

    materials: MaterialTable
    textures: TextureAtlas

    # environment: 6 cube faces, (6, L, L, 3) f32; L=1 zeros when absent.
    # Face order matches convert_xyz_to_cube_uv (Math/cuda_math.hpp:56-126):
    # 0:+x 1:-x 2:+y 3:-y 4:+z 5:-z
    env_faces: Array

    # static (compile-time) flag: does ANY material reference a specular
    # texture?  When False the integrator skips the second bilinear
    # sample_atlas pass entirely (4 gathers per lane per bounce).
    has_specular_tex: bool = flax.struct.field(pytree_node=False, default=True)
    # static flag: can ANY lane ever carry a scattering medium (a material
    # with reduced_scattering.x > 0)?  Gates the free-flight traversal-bound
    # draw in the host loop's seed computation.  Staleness after a live
    # material edit only loses the optimization, never correctness (the
    # per-lane rs_x test is what decides the actual cap).
    has_scatter_media: bool = flax.struct.field(pytree_node=False, default=True)

    @property
    def num_spheres(self) -> int:
        return self.sphere_center.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]

    @property
    def num_bvh_nodes(self) -> int:
        return self.bvh_min.shape[0]

    @property
    def leaf_size(self) -> int:
        return self.bvh_tri.shape[1]

    @property
    def has_env_map(self) -> bool:
        return self.env_faces.shape[1] > 1


@flax.struct.dataclass
class RenderCamera:
    """Flattened POD camera consumed by ray generation.

    Mirrors the reference render_camera (Core/camera.h:14-23): eye point,
    unit view direction, up, resolution, per-axis FOV in degrees, thin-lens
    aperture radius and focal distance.
    """

    eye: Array  # (3,)
    view: Array  # (3,) unit
    up: Array  # (3,)
    resolution: Array  # (2,) (width, height) float
    fov: Array  # (2,) degrees (x, y)
    aperture_radius: Array  # ()
    focal_distance: Array  # ()

    @staticmethod
    def create(eye, view, up, width, height, fov_x_deg, aperture_radius=0.0, focal_distance=None):
        view = np.asarray(view, np.float32)
        view = view / np.linalg.norm(view)
        fov_y = np.degrees(
            2.0 * np.arctan(np.tan(np.radians(fov_x_deg) * 0.5) * (height / width))
        )
        if focal_distance is None:
            focal_distance = 1.0
        return RenderCamera(
            eye=jnp.asarray(eye, jnp.float32),
            view=jnp.asarray(view, jnp.float32),
            up=jnp.asarray(up, jnp.float32),
            resolution=jnp.asarray([width, height], jnp.float32),
            fov=jnp.asarray([fov_x_deg, fov_y], jnp.float32),
            aperture_radius=jnp.asarray(aperture_radius, jnp.float32),
            focal_distance=jnp.asarray(focal_distance, jnp.float32),
        )
