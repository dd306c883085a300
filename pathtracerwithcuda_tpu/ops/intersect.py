"""Primitive intersection, batched over rays (and primitives).

Reference semantics: sphere Core/sphere.h:18-55, triangle (Möller–Trumbore
returning (t, b1, b2)) Core/triangle.h:27-62, AABB slab test
Bvh/bounding_box.h:83-102.
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracerwithcuda_tpu.ops.linalg import cross, dot

INF = jnp.float32(jnp.inf)


def intersect_spheres(origin, direction, center, radius):
    """All rays vs all spheres.

    origin/direction: (P, 3); center: (S, 3); radius: (S,).
    Returns (t, hit): both (P, S); t is the reference's root choice
    (min of the two positive roots, else the positive one), hit requires
    delta >= 0 and at least one root > 0.  Callers apply the `t > 0` filter
    the trace loop uses (Kernel/path_tracer_kernel.cu:433).
    """
    op = center[None, :, :] - origin[:, None, :]  # (P, S, 3)
    b = jnp.sum(op * direction[:, None, :], axis=-1)  # (P, S)
    delta = b * b - jnp.sum(op * op, axis=-1) + (radius * radius)[None, :]
    ok = delta >= 0.0
    # double-where: sqrt'(0) = inf would NaN the cotangents of missed pairs
    root = jnp.sqrt(jnp.where(delta > 0.0, delta, 1.0))
    root = jnp.where(ok, root, 0.0)
    t1 = b - root
    t2 = b + root
    both_pos = (t1 > 0) & (t2 > 0)
    t = jnp.where(both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2))
    hit = ok & ~((t1 < 0) & (t2 < 0))
    return jnp.where(hit, t, INF), hit


def nearest_sphere(origin, direction, center, radius):
    """Reduce intersect_spheres to the closest positive hit per ray.

    Returns (t, index): t = +inf / index = -1 on miss.
    """
    t, hit = intersect_spheres(origin, direction, center, radius)
    valid = hit & (t > 0.0)
    t = jnp.where(valid, t, INF)
    idx = jnp.argmin(t, axis=-1)
    min_t = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
    return min_t, jnp.where(jnp.isinf(min_t), -1, idx.astype(jnp.int32))


def intersect_triangles(origin, direction, v0, v1, v2):
    """Möller–Trumbore, rays broadcast against triangles.

    origin/direction: (..., 3); v0/v1/v2: (..., 3) broadcast-compatible.
    Returns (t, b1, b2, hit); hit applies the barycentric bounds only —
    the caller enforces `t > 0` as the reference trace loop does.
    """
    edge1 = v1 - v0
    edge2 = v2 - v0
    p_vec = cross(direction, edge2)
    det = dot(edge1, p_vec)
    inv_det = jnp.where(det == 0.0, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))
    t_vec = origin - v0
    q_vec = cross(t_vec, edge1)
    b1 = dot(t_vec, p_vec) * inv_det
    b2 = dot(direction, q_vec) * inv_det
    t = dot(edge2, q_vec) * inv_det
    hit = (det != 0.0) & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
    return t, b1, b2, hit


def intersect_aabb(origin, inv_direction, box_min, box_max):
    """Slab test.  Returns (entry_t, hit).

    Matches Bvh/bounding_box.h:83-102 (whose t_min/t_max names are swapped):
    hit iff max-of-near <= min-of-far and min-of-far > 0; entry_t is the
    max-of-near plane used for `entry <= current min_t` pruning.
    """
    t_lo = (box_min - origin) * inv_direction
    t_hi = (box_max - origin) * inv_direction
    near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    return near, (near <= far) & (far > 0.0)
