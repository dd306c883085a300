"""Host scene assembly → device SceneData.

Mirrors the reference's scene → device pipeline
(Core/scene_parser.cpp:465-528 + Core/triangle_mesh.cpp:498-655):

  * mesh Rotate is baked into object-space vertices at load
    (Core/triangle_mesh.cpp:147-166, glm order Rz·Ry·Rx);
  * Position/Scale are applied when producing device triangles
    (Core/triangle_mesh.cpp:615-647), normals via inverse-transpose;
  * per-group materials, extra groups get the last material
    (Core/triangle_mesh.cpp:178,614);
  * per-mesh BVH build, then all BVHs concatenated into one skip chain.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.bvh.build_sah import build_sah_bvh
from pathtracerwithcuda_tpu.bvh.flatten import (
    FlatBVH,
    concatenate_bvhs,
    leaf_runs,
    permute_leaf_contiguous,
)
from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.types import MaterialTable, SceneData, TextureAtlas

# meshes with at most this many triangles skip the BVH and use the dense
# all-pairs intersector (cheaper than a walk at this size)
BRUTE_FORCE_MAX_TRIS = 64


def rotation_matrix_zyx(rotate_deg) -> np.ndarray:
    """R = Rz · Ry · Rx, matching the reference's glm::rotate chain
    (Core/triangle_mesh.cpp:147-166)."""
    rx, ry, rz = [math.radians(float(a)) for a in rotate_deg]
    cx, sx = math.cos(rx), math.sin(rx)
    cy, sy = math.cos(ry), math.sin(ry)
    cz, sz = math.cos(rz), math.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float64)
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float64)
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], np.float64)
    return (mz @ my @ mx).astype(np.float32)


@dataclasses.dataclass
class HostMesh:
    """One OBJ mesh instance: object-space triangles (rotation already baked)
    + per-triangle material index into the global material list."""

    vertices: np.ndarray  # (T, 3, 3)
    normals: np.ndarray  # (T, 3, 3)
    uvs: np.ndarray  # (T, 3, 2)
    material_ids: np.ndarray  # (T,) int32 global material ids
    position: np.ndarray  # (3,)
    scale: np.ndarray  # (3,)
    rotate: np.ndarray  # (3,) degrees — already baked; kept for UI parity

    @staticmethod
    def from_shapes(shapes, shape_material_ids, position, scale, rotate) -> "HostMesh":
        """shapes: list[ObjShape]; shape_material_ids: per-shape global ids
        (shorter lists are extended with the last id, reference behavior)."""
        vs, ns, us, ms = [], [], [], []
        for i, shp in enumerate(shapes):
            mid = shape_material_ids[min(i, len(shape_material_ids) - 1)]
            vs.append(shp.vertices)
            ns.append(shp.normals)
            us.append(shp.uvs)
            ms.append(np.full(shp.num_triangles, mid, np.int32))
        rot = rotation_matrix_zyx(rotate)
        inv_t = np.linalg.inv(rot).T
        v = np.concatenate(vs, axis=0) @ rot.T
        n = np.concatenate(ns, axis=0) @ inv_t.T
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        return HostMesh(
            vertices=v.astype(np.float32),
            normals=n.astype(np.float32),
            uvs=np.concatenate(us, axis=0).astype(np.float32),
            material_ids=np.concatenate(ms, axis=0),
            position=np.asarray(position, np.float32),
            scale=np.asarray(scale, np.float32),
            rotate=np.asarray(rotate, np.float32),
        )

    def world_triangles(self):
        """Apply Position/Scale (Core/triangle_mesh.cpp:615-647)."""
        v = self.vertices * self.scale[None, None, :] + self.position[None, None, :]
        n = self.normals / np.maximum(self.scale[None, None, :], 1e-20)
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        return v.astype(np.float32), n.astype(np.float32)


@dataclasses.dataclass
class HostScene:
    """Everything the parser produced, still host-side/editable."""

    materials: "list[dict]"
    sphere_centers: np.ndarray  # (S, 3)
    sphere_radii: np.ndarray  # (S,)
    sphere_material_ids: np.ndarray  # (S,) int32
    meshes: "list[HostMesh]"
    textures: "list[np.ndarray]"  # (H, W, 3) f32 each
    env_faces: Optional[np.ndarray]  # (6, L, L, 3) f32 or None
    name: str = ""

    @staticmethod
    def empty() -> "HostScene":
        return HostScene(
            materials=[],
            sphere_centers=np.zeros((0, 3), np.float32),
            sphere_radii=np.zeros((0,), np.float32),
            sphere_material_ids=np.zeros((0,), np.int32),
            meshes=[],
            textures=[],
            env_faces=None,
        )


def _build_mesh_bvh(v: np.ndarray, leaf_size: int, num_buckets: int,
                    method: "BvhBuildMethod" = None):
    """BVH build + leaf-contiguous permutation.

    Dispatches on config.bvh_build (reference auto_build_bvh macros,
    Bvh/bvh.h:28-49): SAH = host bucketed-SAH builder (C++ fast path when
    built), LBVH = the jittable Morton/Karras builder (build_lbvh) whose
    leaves are the Morton-sorted triangles (leaf-contiguous, K = 1).
    """
    from pathtracerwithcuda_tpu.config import BvhBuildMethod

    if method == BvhBuildMethod.LBVH:
        from pathtracerwithcuda_tpu.bvh.build_lbvh import build_lbvh, lbvh_to_flat

        lo = v.min(axis=1)
        hi = v.max(axis=1)
        # ONE batched device→host transfer: per-array np.asarray paid a
        # tunnel roundtrip each (~5x the 137 ms build itself on v5e/axon)
        result = jax.device_get(
            build_lbvh(jnp.asarray(lo), jnp.asarray(hi), v.shape[0]))
        return lbvh_to_flat(result), np.asarray(result["order"], np.int64)
    try:
        from pathtracerwithcuda_tpu.native import native_available, native_build_sah

        if native_available():
            return native_build_sah(v[:, 0], v[:, 1], v[:, 2],
                                    leaf_size=leaf_size, num_buckets=num_buckets)
    except Exception as e:  # pragma: no cover — toolchain-dependent
        import logging

        logging.getLogger(__name__).warning("native BVH build failed (%s)", e)
    bvh = build_sah_bvh(v[:, 0], v[:, 1], v[:, 2], leaf_size=leaf_size,
                        num_buckets=num_buckets)
    return permute_leaf_contiguous(bvh)


@dataclasses.dataclass
class MeshLayout:
    """Where one mesh's triangles/BVH nodes landed in the concatenated
    SceneData arrays, plus the transform they were built at — what
    refit-style live edits need (reference dual-copy scheme,
    Bvh/bvh.cpp:326-356)."""

    tri_start: int
    tri_count: int
    node_start: int
    node_count: int
    position: np.ndarray  # (3,) world transform at build time
    scale: np.ndarray  # (3,)


def build_scene_data(host: HostScene, config: RenderConfig,
                     layout_out: "Optional[list]" = None) -> SceneData:
    """Assemble device arrays + BVH (reference create_scene_data_device).

    `layout_out`, if given, is filled with one MeshLayout per mesh (cleared
    first) so callers can apply O(n) refit edits later (render.session).
    """
    # triangles: concatenate all meshes in world space
    tri_v = np.zeros((0, 3, 3), np.float32)
    tri_n = np.zeros((0, 3, 3), np.float32)
    tri_uv = np.zeros((0, 3, 2), np.float32)
    tri_mat = np.zeros((0,), np.int32)
    bvhs: list = []
    tri_offsets: list = []
    node_counts: list = []
    cursor = 0
    for mesh in host.meshes:
        v, n = mesh.world_triangles()
        bvh, perm = _build_mesh_bvh(
            v,
            leaf_size=max(1, config.bvh_leaf_node_triangle_num),
            num_buckets=config.bvh_bucket_max_divide_internal_num,
            method=config.bvh_build,
        )
        tri_v = np.concatenate([tri_v, v[perm]], axis=0)
        tri_n = np.concatenate([tri_n, n[perm]], axis=0)
        tri_uv = np.concatenate([tri_uv, mesh.uvs[perm]], axis=0)
        tri_mat = np.concatenate([tri_mat, mesh.material_ids[perm]], axis=0)
        tri_offsets.append(cursor)
        cursor += v.shape[0]
        bvhs.append(bvh)
        node_counts.append(bvh.num_nodes)

    total_tris = tri_v.shape[0]
    if layout_out is not None:
        layout_out.clear()
        node_cursor = 0
        for mesh, tri_off, n_nodes in zip(host.meshes, tri_offsets, node_counts):
            if total_tris <= BRUTE_FORCE_MAX_TRIS:
                n_start, n_count = 0, 0  # no BVH in the brute-force regime
            else:
                n_start, n_count = node_cursor, n_nodes
            layout_out.append(MeshLayout(
                tri_start=tri_off,
                tri_count=mesh.vertices.shape[0],
                node_start=n_start,
                node_count=n_count,
                position=mesh.position.copy(),
                scale=mesh.scale.copy(),
            ))
            node_cursor += n_nodes
    if total_tris <= BRUTE_FORCE_MAX_TRIS:
        flat = FlatBVH.empty()  # 0/1-node bvh → wavefront picks brute force
    else:
        flat = concatenate_bvhs(bvhs, tri_offsets)
    run_start, run_count = leaf_runs(flat.tri_slots)

    env = host.env_faces
    if env is None:
        env = np.zeros((6, 1, 1, 3), np.float32)

    return SceneData(
        sphere_center=jnp.asarray(host.sphere_centers.reshape(-1, 3)),
        sphere_radius=jnp.asarray(host.sphere_radii.reshape(-1)),
        sphere_material=jnp.asarray(host.sphere_material_ids.reshape(-1)),
        tri_v0=jnp.asarray(tri_v[:, 0]),
        tri_v1=jnp.asarray(tri_v[:, 1]),
        tri_v2=jnp.asarray(tri_v[:, 2]),
        tri_n0=jnp.asarray(tri_n[:, 0]),
        tri_n1=jnp.asarray(tri_n[:, 1]),
        tri_n2=jnp.asarray(tri_n[:, 2]),
        tri_uv0=jnp.asarray(tri_uv[:, 0]),
        tri_uv1=jnp.asarray(tri_uv[:, 1]),
        tri_uv2=jnp.asarray(tri_uv[:, 2]),
        tri_material=jnp.asarray(tri_mat),
        bvh_min=jnp.asarray(flat.node_min),
        bvh_max=jnp.asarray(flat.node_max),
        bvh_next=jnp.asarray(flat.next_index),
        bvh_tri=jnp.asarray(flat.tri_slots),
        bvh_tri_start=jnp.asarray(run_start),
        bvh_tri_count=jnp.asarray(run_count),
        materials=MaterialTable.from_rows(host.materials),
        textures=TextureAtlas.pack(host.textures),
        env_faces=jnp.asarray(env),
        has_specular_tex=any(
            int(m.get("specular_texture_id", -1)) >= 0 for m in host.materials
        ),
        has_scatter_media=any(
            float(np.asarray(m.get("reduced_scattering", (0, 0, 0)))[0]) > 0.0
            for m in host.materials
        ),
    )


# --------------------------------------------------------------------------
# O(n) refit under translate/scale edits
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("t0", "tc", "n0", "nc"))
def _refit_slices_jit(scene: SceneData, ratio, shift,
                      t0: int, tc: int, n0: int, nc: int) -> SceneData:
    """Apply the delta affine x -> ratio*x + shift to one mesh's triangle and
    BVH-node rows.  Exact for a diagonal affine: an axis-aligned box maps to
    an axis-aligned box, so this equals the reference's 8-corner refit
    (Bvh/bvh.cpp:332-356) with no hull slack."""
    def tr(v):
        return v.at[t0:t0 + tc].set(v[t0:t0 + tc] * ratio + shift)

    def trn(n):
        m = n[t0:t0 + tc] / ratio
        m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-20)
        return n.at[t0:t0 + tc].set(m)

    updates = dict(
        tri_v0=tr(scene.tri_v0), tri_v1=tr(scene.tri_v1), tri_v2=tr(scene.tri_v2),
        tri_n0=trn(scene.tri_n0), tri_n1=trn(scene.tri_n1), tri_n2=trn(scene.tri_n2),
    )
    if nc > 0:
        a = scene.bvh_min[n0:n0 + nc] * ratio + shift
        b = scene.bvh_max[n0:n0 + nc] * ratio + shift
        updates["bvh_min"] = scene.bvh_min.at[n0:n0 + nc].set(jnp.minimum(a, b))
        updates["bvh_max"] = scene.bvh_max.at[n0:n0 + nc].set(jnp.maximum(a, b))
    return scene.replace(**updates)


def apply_mesh_transform(scene: SceneData, entry: MeshLayout,
                         position=None, scale=None) -> SceneData:
    """Refit one mesh to a new Position/Scale without rebuilding its BVH —
    the reference's translate/scale fast path (set_mesh_transform_device,
    Core/triangle_mesh.cpp:271-328 + update_bvh).  Rotation edits rebuild
    instead (render.session.set_mesh_rotate).  Updates `entry` in place to
    the new transform."""
    new_p = np.asarray(position if position is not None else entry.position,
                       np.float32)
    new_s = np.asarray(scale if scale is not None else entry.scale, np.float32)
    old_s = np.where(entry.scale == 0.0, 1e-20, entry.scale)
    ratio = (new_s / old_s).astype(np.float32)
    shift = (new_p - ratio * entry.position).astype(np.float32)
    scene = _refit_slices_jit(
        scene, jnp.asarray(ratio), jnp.asarray(shift),
        entry.tri_start, entry.tri_count, entry.node_start, entry.node_count,
    )
    entry.position = new_p.copy()
    entry.scale = new_s.copy()
    return scene
