"""Flattened skip-link BVH arrays + refit.

Layout parity with the reference device flattening (Bvh/bvh.cpp:244-330):
preorder (left-first DFS) node order; per node an AABB, a skip link
``next[i]`` = preorder index just past node i's subtree (root's = node
count, which doubles as the traversal terminal — Bvh/bvh.cpp:304-311 and
Kernel/path_tracer_kernel.cu:111-113), and K triangle-index slots padded
with -1 (internal nodes: all -1).

The reference allocates the node array twice (initial + transformed copies,
Bvh/bvh.cpp:326-329) to support O(n) refit under translate/scale edits
(Bvh/bvh.cpp:332-356).  Here the "initial" copy is just kept host-side by the
scene, and ``refit_affine`` produces the transformed AABBs as a vmapped
corner transform — jittable, so live edits stay on-device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FlatBVH:
    """Host-side flattened BVH (numpy)."""

    node_min: np.ndarray  # (N, 3) f32
    node_max: np.ndarray  # (N, 3) f32
    next_index: np.ndarray  # (N,) i32 skip links; next_index[0] == N
    tri_slots: np.ndarray  # (N, K) i32, -1 padded

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    @property
    def leaf_size(self) -> int:
        return self.tri_slots.shape[1]

    @staticmethod
    def empty(leaf_size: int = 1) -> "FlatBVH":
        return FlatBVH(
            node_min=np.zeros((0, 3), np.float32),
            node_max=np.zeros((0, 3), np.float32),
            next_index=np.zeros((0,), np.int32),
            tri_slots=np.zeros((0, leaf_size), np.int32),
        )


def permute_leaf_contiguous(bvh: FlatBVH):
    """Reorder triangles so each leaf's triangles are one contiguous run.

    Returns (bvh', permutation) where permutation[i] = original index of the
    triangle now stored at position i, and bvh'.tri_slots hold the new
    (consecutive) indices.  This is the device-layout trick the reference's
    packed stride-K leaf table approximates (Bvh/bvh.cpp:282-301); with a
    contiguous run a leaf fetch becomes a single dynamic slice — exactly what
    the Pallas packet kernel needs.
    """
    perm = []
    new_slots = -np.ones_like(bvh.tri_slots)
    for i in range(bvh.num_nodes):
        ids = bvh.tri_slots[i]
        ids = ids[ids >= 0]
        if len(ids) == 0:
            continue
        start = len(perm)
        perm.extend(ids.tolist())
        new_slots[i, : len(ids)] = np.arange(start, start + len(ids))
    out = FlatBVH(
        node_min=bvh.node_min,
        node_max=bvh.node_max,
        next_index=bvh.next_index,
        tri_slots=new_slots.astype(np.int32),
    )
    return out, np.asarray(perm, np.int64)


def leaf_runs(tri_slots: np.ndarray):
    """(start, count) per node from contiguous tri_slots; start = -1 internal."""
    count = (tri_slots >= 0).sum(axis=1).astype(np.int32)
    start = np.where(count > 0, tri_slots[:, 0], -1).astype(np.int32)
    return start, count


def concatenate_bvhs(bvhs: "list[FlatBVH]", tri_offsets: "list[int]") -> FlatBVH:
    """Concatenate per-mesh BVHs into one skip chain.

    Each mesh's skip links are shifted by its node offset and its triangle
    slots by its global triangle offset; mesh k's root skip then lands exactly
    on mesh k+1's root, turning the reference's sequential per-mesh walks
    (Kernel/path_tracer_kernel.cu:443-454) into a single traversal.
    """
    if not bvhs:
        return FlatBVH.empty()
    k = max(b.leaf_size for b in bvhs)
    mins, maxs, nexts, slots = [], [], [], []
    node_offset = 0
    for b, tri_off in zip(bvhs, tri_offsets):
        mins.append(b.node_min)
        maxs.append(b.node_max)
        nexts.append(b.next_index + node_offset)
        s = b.tri_slots
        if s.shape[1] < k:
            pad = -np.ones((s.shape[0], k - s.shape[1]), np.int32)
            s = np.concatenate([s, pad], axis=1)
        slots.append(np.where(s >= 0, s + tri_off, -1).astype(np.int32))
        node_offset += b.num_nodes
    return FlatBVH(
        node_min=np.concatenate(mins, axis=0),
        node_max=np.concatenate(maxs, axis=0),
        next_index=np.concatenate(nexts, axis=0).astype(np.int32),
        tri_slots=np.concatenate(slots, axis=0),
    )


@jax.jit
def refit_affine(node_min, node_max, matrix):
    """Refit AABBs under a 4x4 affine transform (reference update_bvh,
    Bvh/bvh.cpp:332-356: transformed AABB = hull of the 8 transformed
    corners).  node_min/node_max: (N, 3); matrix: (4, 4) row-major."""
    corners_unit = jnp.asarray(
        [[(i >> 2) & 1, (i >> 1) & 1, i & 1] for i in range(8)], jnp.float32
    )  # (8, 3) in {0,1}
    corners = node_min[:, None, :] + corners_unit[None] * (node_max - node_min)[:, None, :]
    rotated = jnp.einsum("ij,nkj->nki", matrix[:3, :3], corners) + matrix[:3, 3]
    return jnp.min(rotated, axis=1), jnp.max(rotated, axis=1)


def validate(bvh: FlatBVH, num_triangles: int) -> "list[str]":
    """Structural invariants (test support): skip links form a valid preorder
    walk, every triangle is reachable exactly once, leaf AABBs contain their
    triangle slots' ids in range."""
    errors = []
    n = bvh.num_nodes
    if n == 0:
        if num_triangles:
            errors.append("empty bvh with triangles present")
        return errors
    if bvh.next_index[0] > n:
        errors.append(f"root skip {bvh.next_index[0]} > node count {n}")
    seen = []
    for i in range(n):
        nxt = int(bvh.next_index[i])
        if not (i < nxt <= n):
            errors.append(f"node {i}: skip link {nxt} not in ({i}, {n}]")
        ids = bvh.tri_slots[i]
        ids = ids[ids >= 0]
        seen.extend(ids.tolist())
        if np.any(ids >= num_triangles):
            errors.append(f"node {i}: triangle id out of range")
    if sorted(seen) != list(range(num_triangles)):
        errors.append(
            f"triangles not covered exactly once ({len(seen)} refs, {num_triangles} tris)"
        )
    return errors
