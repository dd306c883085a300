"""Jittable LBVH builder: invariants + traversal equality with brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracerwithcuda_tpu.bvh.build_lbvh import build_lbvh, lbvh_to_flat, morton_codes
from pathtracerwithcuda_tpu.bvh.flatten import validate
from pathtracerwithcuda_tpu.ops.traversal import (
    brute_force_nearest_triangle,
    traverse_bvh,
)


def _tris(rng, n, spread=5.0):
    base = rng.uniform(-spread, spread, (n, 1, 3))
    return (base + rng.normal(size=(n, 3, 3)) * 0.4).astype(np.float32)


def test_morton_locality():
    c = jnp.asarray([[0.0, 0.0, 0.0], [0.01, 0.01, 0.01], [1.0, 1.0, 1.0]])
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    codes = np.asarray(morton_codes(c, lo, hi))
    assert codes[0] == 0
    # nearby points share a long prefix; the far one doesn't
    assert (int(codes[0]) ^ int(codes[1])) < (int(codes[0]) ^ int(codes[2]))


@pytest.mark.parametrize("n", [1, 2, 3, 17, 256, 500])
def test_lbvh_invariants(rng_np, n):
    tri = _tris(rng_np, n)
    lo = np.minimum(np.minimum(tri[:, 0], tri[:, 1]), tri[:, 2])
    hi = np.maximum(np.maximum(tri[:, 0], tri[:, 1]), tri[:, 2])
    res = build_lbvh(jnp.asarray(lo), jnp.asarray(hi), n)
    flat = lbvh_to_flat(res)
    errors = validate(flat, n)
    assert not errors, errors
    assert flat.num_nodes == 2 * n - 1
    order = np.asarray(res["order"])
    assert sorted(order.tolist()) == list(range(n))


def test_lbvh_traversal_matches_brute_force(rng_np):
    n = 400
    tri = _tris(rng_np, n)
    lo = np.minimum(np.minimum(tri[:, 0], tri[:, 1]), tri[:, 2])
    hi = np.maximum(np.maximum(tri[:, 0], tri[:, 1]), tri[:, 2])
    res = build_lbvh(jnp.asarray(lo), jnp.asarray(hi), n)
    flat = lbvh_to_flat(res)
    tri_sorted = tri[np.asarray(res["order"])]

    r = 400
    o = rng_np.uniform(-8, 8, (r, 3)).astype(np.float32)
    d = rng_np.normal(size=(r, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    jv = [jnp.asarray(tri_sorted[:, i]) for i in range(3)]
    _, t_b = brute_force_nearest_triangle(jnp.asarray(o), jnp.asarray(d), *jv)
    _, t_t = traverse_bvh(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(flat.node_min), jnp.asarray(flat.node_max),
        jnp.asarray(flat.next_index), jnp.asarray(flat.tri_slots), *jv,
    )
    t_b, t_t = np.asarray(t_b), np.asarray(t_t)
    assert (np.isfinite(t_b) == np.isfinite(t_t)).all()
    fin = np.isfinite(t_b)
    assert np.allclose(t_b[fin], t_t[fin], rtol=1e-5, atol=1e-6)


def test_lbvh_duplicate_centroids(rng_np):
    """All triangles at the same spot: index tie-break must keep the radix
    tree valid (the reference needs leaf batching for this case)."""
    n = 64
    tri = np.broadcast_to(
        rng_np.normal(size=(1, 3, 3)), (n, 3, 3)
    ).astype(np.float32).copy()
    lo = np.minimum(np.minimum(tri[:, 0], tri[:, 1]), tri[:, 2])
    hi = np.maximum(np.maximum(tri[:, 0], tri[:, 1]), tri[:, 2])
    res = build_lbvh(jnp.asarray(lo), jnp.asarray(hi), n)
    flat = lbvh_to_flat(res)
    assert not validate(flat, n), validate(flat, n)
