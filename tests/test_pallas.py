"""Pallas packet-traversal kernel vs brute force (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracerwithcuda_tpu.bvh.build_sah import build_sah_bvh
from pathtracerwithcuda_tpu.bvh.flatten import (
    leaf_runs,
    permute_leaf_contiguous,
    validate,
)
from pathtracerwithcuda_tpu.ops.traversal import brute_force_nearest_triangle
from pathtracerwithcuda_tpu.ops.traversal_pallas import (
    traverse_bvh_packets,
    vmem_table_bytes,
)


def _build(rng, n, leaf):
    base = rng.uniform(-5, 5, (n, 1, 3))
    tri = (base + rng.normal(size=(n, 3, 3)) * 0.4).astype(np.float32)
    bvh = build_sah_bvh(tri[:, 0], tri[:, 1], tri[:, 2], leaf_size=leaf)
    bvh, perm = permute_leaf_contiguous(bvh)
    tri = tri[perm]
    start, count = leaf_runs(bvh.tri_slots)
    return tri, bvh, start, count


def _rays(rng, r):
    o = rng.uniform(-8, 8, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3))
    return o, (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("leaf", [1, 4])
def test_packets_match_brute_force(rng_np, leaf):
    tri, bvh, start, count = _build(rng_np, 350, leaf)
    assert not validate(bvh, 350)
    o, d = _rays(rng_np, 260)  # non-multiple of 128 exercises padding
    jv = [jnp.asarray(tri[:, i]) for i in range(3)]
    tb, t_b = brute_force_nearest_triangle(jnp.asarray(o), jnp.asarray(d), *jv)
    tp, t_p = traverse_bvh_packets(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(bvh.node_min), jnp.asarray(bvh.node_max),
        jnp.asarray(bvh.next_index), jnp.asarray(start), jnp.asarray(count),
        *jv, leaf_k=leaf, interpret=True,
    )
    t_b, t_p = np.asarray(t_b), np.asarray(t_p)
    assert (np.isfinite(t_b) == np.isfinite(t_p)).all()
    fin = np.isfinite(t_b)
    assert np.allclose(t_b[fin], t_p[fin], rtol=1e-5, atol=1e-6)


def test_packets_respect_seed_bound(rng_np):
    tri, bvh, start, count = _build(rng_np, 200, 4)
    o, d = _rays(rng_np, 128)
    jv = [jnp.asarray(tri[:, i]) for i in range(3)]
    args = (
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(bvh.node_min), jnp.asarray(bvh.node_max),
        jnp.asarray(bvh.next_index), jnp.asarray(start), jnp.asarray(count),
        *jv,
    )
    _, t_free = traverse_bvh_packets(*args, leaf_k=4, interpret=True)
    bound = jnp.full((128,), 4.0)
    tri_b, t_b = traverse_bvh_packets(*args, bound, leaf_k=4, interpret=True)
    t_free, t_b = np.asarray(t_free), np.asarray(t_b)
    assert np.all(t_b[np.isfinite(t_b)] < 4.0)
    close = np.isfinite(t_free) & (t_free < 4.0)
    assert np.allclose(t_b[close], t_free[close], rtol=1e-6)
    assert np.all(np.isinf(t_b[~close]))


def test_vmem_budget_estimate():
    # flagship-class scene (66k tris, leaf 4 → ~33k nodes) fits,
    # a 5M-triangle scene does not
    assert vmem_table_bytes(33026, 66052, 4) < 12 * 2**20
    assert vmem_table_bytes(2_500_000, 5_000_000, 4) > 16 * 2**20


def test_packets_survive_segment_stalls(rng_np):
    """Rows that fill their SEG_CAP leaf list mid-walk must stall without
    clobbering live entries (regression: stalled rows used to overwrite the
    last list slot, silently losing leaves → missed hits).  Dense converging
    rays on a leaf-1 tree force every row through > SEG_CAP leaves."""
    from pathtracerwithcuda_tpu.ops.traversal_pallas import SEG_CAP

    n = 300  # leaf-1 -> 300 leaves, far more than SEG_CAP per segment
    tri, bvh, start, count = _build(rng_np, n, 1)
    r = 256
    # rays converge on the blob from one side -> each row's walk visits most
    # of the tree and must segment several times
    o = np.tile(np.array([[0.0, 0.0, 30.0]], np.float32), (r, 1))
    o += rng_np.normal(size=(r, 3)).astype(np.float32) * 0.05
    target = rng_np.uniform(-4, 4, (r, 3)).astype(np.float32)
    d = target - o
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    assert n > SEG_CAP
    jv = [jnp.asarray(tri[:, i]) for i in range(3)]
    tb, t_b = brute_force_nearest_triangle(jnp.asarray(o), jnp.asarray(d), *jv)
    tp, t_p = traverse_bvh_packets(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(bvh.node_min), jnp.asarray(bvh.node_max),
        jnp.asarray(bvh.next_index), jnp.asarray(start), jnp.asarray(count),
        *jv, leaf_k=1, interpret=True,
    )
    t_b, t_p = np.asarray(t_b), np.asarray(t_p)
    assert (np.isfinite(t_b) == np.isfinite(t_p)).all()
    fin = np.isfinite(t_b)
    assert fin.sum() > r // 4  # the setup actually produces dense hits
    assert np.allclose(t_b[fin], t_p[fin], rtol=1e-5, atol=1e-6)
