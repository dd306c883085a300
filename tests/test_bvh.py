"""BVH builder invariants + traversal equivalence with brute force."""

import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.bvh.build_sah import build_sah_bvh
from pathtracerwithcuda_tpu.bvh.flatten import concatenate_bvhs, refit_affine, validate
from pathtracerwithcuda_tpu.ops.traversal import (
    brute_force_nearest_triangle,
    traverse_bvh,
)


def _random_tris(rng, n, spread=5.0):
    base = rng.uniform(-spread, spread, (n, 1, 3))
    offs = rng.normal(size=(n, 3, 3)) * 0.4
    v = (base + offs).astype(np.float32)
    return v[:, 0], v[:, 1], v[:, 2]


def test_invariants(rng_np):
    for n in (1, 2, 7, 100, 500):
        v0, v1, v2 = _random_tris(rng_np, n)
        for leaf in (1, 4):
            bvh = build_sah_bvh(v0, v1, v2, leaf_size=leaf)
            errors = validate(bvh, n)
            assert not errors, errors
            assert bvh.next_index[0] == bvh.num_nodes


def test_leaf_aabbs_contain_triangles(rng_np):
    v0, v1, v2 = _random_tris(rng_np, 200)
    bvh = build_sah_bvh(v0, v1, v2, leaf_size=4)
    for i in range(bvh.num_nodes):
        ids = bvh.tri_slots[i]
        ids = ids[ids >= 0]
        if len(ids) == 0:
            continue
        tri_lo = np.minimum(np.minimum(v0[ids], v1[ids]), v2[ids]).min(axis=0)
        tri_hi = np.maximum(np.maximum(v0[ids], v1[ids]), v2[ids]).max(axis=0)
        assert np.all(bvh.node_min[i] <= tri_lo + 1e-5)
        assert np.all(bvh.node_max[i] >= tri_hi - 1e-5)


def test_traversal_matches_brute_force(rng_np):
    n = 400
    v0, v1, v2 = _random_tris(rng_np, n)
    bvh = build_sah_bvh(v0, v1, v2, leaf_size=4)

    r = 512
    o = rng_np.uniform(-8, 8, (r, 3)).astype(np.float32)
    d = rng_np.normal(size=(r, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    jv0, jv1, jv2 = jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    tri_b, t_b = brute_force_nearest_triangle(jnp.asarray(o), jnp.asarray(d), jv0, jv1, jv2)
    tri_t, t_t = traverse_bvh(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(bvh.node_min), jnp.asarray(bvh.node_max),
        jnp.asarray(bvh.next_index), jnp.asarray(bvh.tri_slots),
        jv0, jv1, jv2,
    )
    t_b, t_t = np.asarray(t_b), np.asarray(t_t)
    tri_b, tri_t = np.asarray(tri_b), np.asarray(tri_t)
    # hit t must agree everywhere (same float math on the winning triangle)
    both = np.isfinite(t_b) & np.isfinite(t_t)
    assert (np.isfinite(t_b) == np.isfinite(t_t)).all()
    assert np.allclose(t_b[both], t_t[both], rtol=1e-5, atol=1e-6)
    # indices may differ only for exactly-equal t (coplanar dupes) — check t
    same = tri_b == tri_t
    assert np.allclose(t_b[~same & both], t_t[~same & both], rtol=1e-6)


def test_concatenated_meshes(rng_np):
    """Two meshes concatenated → one walk finds hits in both."""
    v0a, v1a, v2a = _random_tris(rng_np, 60, spread=2.0)
    v0b, v1b, v2b = _random_tris(rng_np, 80, spread=2.0)
    v0b = v0b + 20.0  # disjoint region
    v1b = v1b + 20.0
    v2b = v2b + 20.0
    bvh_a = build_sah_bvh(v0a, v1a, v2a, leaf_size=2)
    bvh_b = build_sah_bvh(v0b, v1b, v2b, leaf_size=2)
    cat = concatenate_bvhs([bvh_a, bvh_b], [0, 60])
    assert not validate(cat, 140)

    v0 = np.concatenate([v0a, v0b])
    v1 = np.concatenate([v1a, v1b])
    v2 = np.concatenate([v2a, v2b])
    r = 256
    o = np.concatenate(
        [rng_np.uniform(-5, 5, (r // 2, 3)), rng_np.uniform(15, 25, (r // 2, 3))]
    ).astype(np.float32)
    d = rng_np.normal(size=(r, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    jv = [jnp.asarray(x) for x in (v0, v1, v2)]
    tri_b, t_b = brute_force_nearest_triangle(jnp.asarray(o), jnp.asarray(d), *jv)
    tri_t, t_t = traverse_bvh(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(cat.node_min), jnp.asarray(cat.node_max),
        jnp.asarray(cat.next_index), jnp.asarray(cat.tri_slots), *jv,
    )
    assert (np.isfinite(np.asarray(t_b)) == np.isfinite(np.asarray(t_t))).all()
    fin = np.isfinite(np.asarray(t_b))
    assert np.allclose(np.asarray(t_b)[fin], np.asarray(t_t)[fin], rtol=1e-5, atol=1e-6)


def test_min_t0_bound(rng_np):
    """Triangles farther than the seed bound must not be reported."""
    v0, v1, v2 = _random_tris(rng_np, 100)
    bvh = build_sah_bvh(v0, v1, v2, leaf_size=2)
    o = np.zeros((64, 3), np.float32)
    d = rng_np.normal(size=(64, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    jv = [jnp.asarray(x) for x in (v0, v1, v2)]
    args = (
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(bvh.node_min), jnp.asarray(bvh.node_max),
        jnp.asarray(bvh.next_index), jnp.asarray(bvh.tri_slots), *jv,
    )
    tri_free, t_free = traverse_bvh(*args)
    bound = jnp.full((64,), 3.0)
    tri_bnd, t_bnd = traverse_bvh(*args, bound)
    t_free, t_bnd = np.asarray(t_free), np.asarray(t_bnd)
    assert np.all(t_bnd[np.isfinite(t_bnd)] < 3.0)
    close = np.isfinite(t_free) & (t_free < 3.0)
    assert np.allclose(t_bnd[close], t_free[close], rtol=1e-6)
    assert np.all(np.isinf(t_bnd[~close]))


def test_refit_affine():
    node_min = jnp.asarray([[-1.0, -1.0, -1.0], [0.0, 0.0, 0.0]])
    node_max = jnp.asarray([[1.0, 1.0, 1.0], [2.0, 3.0, 4.0]])
    # scale by 2 and translate by (1, 0, 0)
    m = jnp.asarray(
        [[2.0, 0, 0, 1.0], [0, 2.0, 0, 0], [0, 0, 2.0, 0], [0, 0, 0, 1.0]]
    )
    lo, hi = refit_affine(node_min, node_max, m)
    assert np.allclose(np.asarray(lo)[0], [-1.0, -2.0, -2.0])
    assert np.allclose(np.asarray(hi)[1], [5.0, 6.0, 8.0])
