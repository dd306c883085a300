"""Stackless skip-link BVH traversal (XLA reference path).

The reference walks a preorder-flattened BVH with skip links
(Kernel/path_tracer_kernel.cu:85-161): advance to ``pos + 1`` when the node's
AABB is hit (descend), jump to ``node.next`` when missed; leaves test up to K
triangles.  That walk is already stack-free, which maps directly onto a
``lax.while_loop`` whose carry holds each lane's traversal cursor.

All per-mesh BVHs are concatenated (see SceneData), so one walk covers every
mesh: node count == start of "no more nodes" == the terminal cursor value.

Divergence strategy: the loop runs until the *slowest lane in the batch*
terminates, so callers chunk the wavefront (render.wavefront) to bound the
divergence domain; a Pallas kernel (ops/traversal_pallas.py) is the hot path.

Differentiation: the walk returns only int32 hit indices (plus a float t used
for control flow under ``stop_gradient``); differentiable hit attributes are
recomputed from the indices by ``hit_attributes`` so gradients flow to vertex
and ray data without differentiating the while loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracerwithcuda_tpu.ops.intersect import (
    INF,
    intersect_aabb,
    intersect_triangles,
)


def traverse_bvh(origin, direction, bvh_min, bvh_max, bvh_next, bvh_tri,
                 tri_v0, tri_v1, tri_v2, min_t0=None):
    """Closest triangle hit along each ray.

    origin/direction: (C, 3).  min_t0: optional (C,) initial upper bound
    (e.g. the closest sphere hit) used both for pruning and as the "beat this"
    threshold — the final result only reports triangles strictly closer.

    Returns (tri_index, t): (C,) int32 (-1 = none closer than min_t0) and
    (C,) float32 hit t (inf when tri_index == -1).
    """
    num_nodes = bvh_min.shape[0]
    c = origin.shape[0]
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    inv_dir = 1.0 / direction

    pos0 = jnp.zeros((c,), jnp.int32)
    min_t = jnp.full((c,), INF) if min_t0 is None else jax.lax.stop_gradient(min_t0)
    tri_idx0 = jnp.full((c,), -1, jnp.int32)

    if num_nodes == 0:
        return tri_idx0, jnp.full((c,), INF)

    def cond(carry):
        pos, _, _ = carry
        return jnp.any(pos < num_nodes)

    def body(carry):
        pos, best_t, best_tri = carry
        active = pos < num_nodes
        node = jnp.clip(pos, 0, num_nodes - 1)

        entry_t, box_hit = intersect_aabb(origin, inv_dir, bvh_min[node], bvh_max[node])
        descend = active & box_hit & (entry_t <= best_t)

        # leaf triangle tests (internal nodes carry all -1 slots)
        tri_ids = bvh_tri[node]  # (C, K)
        slot_valid = (tri_ids >= 0) & descend[:, None]
        safe_ids = jnp.clip(tri_ids, 0, tri_v0.shape[0] - 1)
        t, _, _, hit = intersect_triangles(
            origin[:, None, :], direction[:, None, :],
            tri_v0[safe_ids], tri_v1[safe_ids], tri_v2[safe_ids],
        )
        cand = hit & slot_valid & (t > 0.0) & (t < best_t[:, None])
        t_masked = jnp.where(cand, t, INF)
        k_best = jnp.argmin(t_masked, axis=-1)
        t_best = jnp.take_along_axis(t_masked, k_best[:, None], axis=-1)[:, 0]
        improved = t_best < best_t
        best_t = jnp.where(improved, t_best, best_t)
        best_tri = jnp.where(
            improved, jnp.take_along_axis(safe_ids, k_best[:, None], axis=-1)[:, 0], best_tri
        )

        nxt = jnp.where(descend, pos + 1, bvh_next[node])
        pos = jnp.where(active, nxt, pos)
        return pos, best_t, best_tri

    _, best_t, best_tri = jax.lax.while_loop(cond, body, (pos0, min_t, tri_idx0))
    best_t = jnp.where(best_tri >= 0, best_t, INF)
    return best_tri, best_t


def brute_force_nearest_triangle(origin, direction, tri_v0, tri_v1, tri_v2, min_t0=None):
    """O(C * T) all-pairs closest hit — correctness oracle for the BVH walk,
    and the fast path for tiny meshes where a BVH would be overhead."""
    t, _, _, hit = intersect_triangles(
        origin[:, None, :], direction[:, None, :],
        tri_v0[None], tri_v1[None], tri_v2[None],
    )
    bound = INF if min_t0 is None else min_t0[:, None]
    valid = hit & (t > 0.0) & (t < bound)
    t_masked = jnp.where(valid, t, INF)
    idx = jnp.argmin(t_masked, axis=-1)
    best = jnp.take_along_axis(t_masked, idx[:, None], axis=-1)[:, 0]
    tri = jnp.where(jnp.isinf(best), -1, idx.astype(jnp.int32))
    return tri, best


def hit_attributes(origin, direction, tri_index, tri_v0, tri_v1, tri_v2):
    """Differentiably recompute (t, b1, b2) for the chosen triangle.

    tri_index: (C,) int32 with -1 for misses (clamped for the gather; callers
    mask by hit).  Gradients flow to ray and vertex inputs through the
    Möller–Trumbore algebra.
    """
    safe = jnp.clip(tri_index, 0, tri_v0.shape[0] - 1)
    t, b1, b2, _ = intersect_triangles(
        origin, direction, tri_v0[safe], tri_v1[safe], tri_v2[safe]
    )
    return t, b1, b2
