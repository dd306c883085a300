"""Unit tests for primitive intersection against independent NumPy math."""

import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.ops.intersect import (
    intersect_aabb,
    intersect_triangles,
    nearest_sphere,
)


def test_sphere_hit_miss(rng_np):
    center = jnp.asarray([[0.0, 0.0, -5.0]])
    radius = jnp.asarray([1.0])
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, idx = nearest_sphere(o, d, center, radius)
    assert np.isclose(t[0], 4.0, atol=1e-5)
    assert idx[0] == 0
    assert np.isinf(t[1]) and idx[1] == -1


def test_sphere_inside():
    # ray starting inside: positive root t2 is returned
    center = jnp.asarray([[0.0, 0.0, 0.0]])
    radius = jnp.asarray([2.0])
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t, idx = nearest_sphere(o, d, center, radius)
    assert np.isclose(t[0], 2.0, atol=1e-5)


def test_nearest_of_many(rng_np):
    centers = jnp.asarray([[0, 0, -3.0], [0, 0, -7.0], [0, 0, -1.5]])
    radii = jnp.asarray([0.5, 0.5, 0.25])
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx = nearest_sphere(o, d, centers, radii)
    assert idx[0] == 2
    assert np.isclose(t[0], 1.25, atol=1e-5)


def test_triangle_barycentric():
    v0 = jnp.asarray([[0.0, 0.0, -2.0]])
    v1 = jnp.asarray([[1.0, 0.0, -2.0]])
    v2 = jnp.asarray([[0.0, 1.0, -2.0]])
    o = jnp.asarray([[0.25, 0.25, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, b1, b2, hit = intersect_triangles(o, d, v0, v1, v2)
    assert bool(hit[0])
    assert np.isclose(t[0], 2.0, atol=1e-5)
    assert np.isclose(b1[0], 0.25, atol=1e-5)
    assert np.isclose(b2[0], 0.25, atol=1e-5)


def test_triangle_random_vs_numpy(rng_np):
    n = 256
    v0, v1, v2 = [jnp.asarray(rng_np.normal(size=(n, 3)), jnp.float32) for _ in range(3)]
    o = jnp.asarray(rng_np.normal(size=(n, 3)) * 3, jnp.float32)
    d_raw = rng_np.normal(size=(n, 3))
    d = jnp.asarray(d_raw / np.linalg.norm(d_raw, axis=-1, keepdims=True), jnp.float32)
    t, b1, b2, hit = intersect_triangles(o, d, v0, v1, v2)
    # verify hit points lie on the triangle plane
    hp = np.asarray(o + d * t[:, None])
    normal = np.cross(np.asarray(v1 - v0), np.asarray(v2 - v0))
    plane_dist = np.abs(np.sum((hp - np.asarray(v0)) * normal, axis=-1)) / (
        np.linalg.norm(normal, axis=-1) + 1e-9
    )
    hits = np.asarray(hit)
    assert hits.sum() >= 3  # sanity: some hits occurred
    assert np.all(plane_dist[hits] < 1e-3)
    # barycentric reconstruction matches the hit point
    w0 = (1 - b1 - b2)[:, None]
    recon = np.asarray(w0 * v0 + b1[:, None] * v1 + b2[:, None] * v2)
    assert np.allclose(recon[hits], hp[hits], atol=1e-3)


def test_aabb_slab():
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.5, 0.5, 0.5]])
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 3)
    inv = 1.0 / d
    lo = jnp.asarray([-1.0, -1.0, -3.0])
    hi = jnp.asarray([1.0, 1.0, -2.0])
    entry, hit = intersect_aabb(o, inv, lo, hi)
    assert bool(hit[0]) and np.isclose(entry[0], 2.0, atol=1e-5)
    assert not bool(hit[1])


def test_aabb_origin_inside():
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    entry, hit = intersect_aabb(o, 1.0 / d, jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
    # inside the box: near plane is behind but far > 0 → hit
    assert bool(hit[0])
