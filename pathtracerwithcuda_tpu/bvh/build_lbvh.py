"""Jittable LBVH (linear BVH) builder — on-device Morton-code build.

Parity role: the reference's Morton builders (#2 CPU, #3 CUDA — Karras-style
radix tree from 30-bit Morton codes, Bvh/bvh.cpp:359-1068 and
Kernel/bvh_morton_code_kernel.cu; method per Karras 2012, cited by the
reference at Bvh/bvh.cpp:466-467).  Used for dynamic rebuilds that should
stay on-device; the host SAH builder remains the quality default.

Everything is fixed-shape jnp, so the whole build jits:
  1. 30-bit Morton codes of triangle-AABB centroids, normalized to the scene
     box (codes made unique by appending the index in a 64-bit key — the
     reference handles duplicates with leaf batching instead);
  2. argsort → triangles in Morton order (leaves ARE the sorted triangles,
     so the layout is leaf-contiguous with K = 1 by construction);
  3. Karras internal-node ranges/splits via vectorized common-prefix binary
     search (no recursion);
  4. bottom-up AABBs and top-down preorder numbering by fixed-depth parallel
     sweeps (a radix tree over unique 64-bit keys has depth <= 64), replacing
     the reference's atomic visited-flag walk (Bvh/bvh.cpp:628-665);
  5. scatter into the preorder skip-link SoA the traversal kernels consume.

Returns device arrays (node_min, node_max, next_index, tri_start, tri_count,
permutation); `flatten.FlatBVH`-compatible via lbvh_to_flat for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_DEPTH = 64  # radix-tree depth bound for unique 64-bit keys


def _expand_bits_10(v):
    """Spread 10 bits to every 3rd position (standard Morton magic)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(centroids, scene_lo, scene_hi):
    """(T, 3) centroids -> (T,) uint32 30-bit Morton codes."""
    x = (centroids - scene_lo) / jnp.maximum(scene_hi - scene_lo, 1e-20)
    q = jnp.clip(x * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits_10(q[:, 0]) << 2)
        | (_expand_bits_10(q[:, 1]) << 1)
        | _expand_bits_10(q[:, 2])
    )


@functools.partial(jax.jit, static_argnames=("num_tris",))
def build_lbvh(tri_lo, tri_hi, num_tris: int):
    """Build from per-triangle AABBs.

    Returns dict with preorder SoA arrays:
      node_min/node_max (2T-1, 3), next_index (2T-1,), tri_start/tri_count
      (2T-1,), order (T,) — triangle permutation (sorted Morton order).
    """
    t = num_tris
    if t == 1:
        eps = 1e-6 * jnp.maximum(1.0, jnp.abs(tri_lo))
        return {
            "node_min": tri_lo - eps,
            "node_max": tri_hi + eps,
            "next_index": jnp.ones((1,), jnp.int32),
            "tri_start": jnp.zeros((1,), jnp.int32),
            "tri_count": jnp.ones((1,), jnp.int32),
            "order": jnp.zeros((1,), jnp.int32),
        }
    centroid = 0.5 * (tri_lo + tri_hi)
    scene_lo = jnp.min(tri_lo, axis=0)
    scene_hi = jnp.max(tri_hi, axis=0)
    codes = morton_codes(centroid, scene_lo, scene_hi)

    order = jnp.argsort(codes)
    codes_sorted = codes[order]
    # conceptual 64-bit unique key = (code, sorted index) — compared as a
    # uint32 pair so no x64 mode is needed
    idx_u32 = jnp.arange(t, dtype=jnp.uint32)

    def delta(i, j):
        ok = (j >= 0) & (j < t)
        js = jnp.clip(j, 0, t - 1)
        cx = codes_sorted[i] ^ codes_sorted[js]
        ix = idx_u32[i] ^ idx_u32[js]
        clz = jnp.where(
            cx != 0,
            jax.lax.clz(cx).astype(jnp.int32),
            32 + jax.lax.clz(ix).astype(jnp.int32),
        )
        return jnp.where(ok, clz, -1)

    # --- Karras ranges for internal nodes i in [0, t-2]
    i = jnp.arange(t - 1)
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # upper bound for range length by doubling (keys are 64-bit → <= 2^7 steps
    # would overflow t; cap by doubling until delta drops, 32 fixed steps)
    def grow(carry, _):
        lmax = carry
        bigger = delta(i, i + lmax * d) > delta_min
        return jnp.where(bigger, lmax * 2, lmax), None

    lmax, _ = jax.lax.scan(grow, jnp.full(i.shape, 2, jnp.int32), None, length=24)

    # binary search the exact other end
    def shrink(carry, step_pow):
        l = carry
        step = lmax // step_pow
        cond = delta(i, i + (l + step) * d) > delta_min
        return jnp.where((step >= 1) & cond, l + step, l), None

    powers = 2 ** jnp.arange(1, 26, dtype=jnp.int32)
    l, _ = jax.lax.scan(shrink, jnp.zeros(i.shape, jnp.int32), powers)
    j = i + l * d  # other end of the range

    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)

    # split position: longest prefix within [first, last]
    delta_node = delta(first, last)

    def split_step(carry, step_pow):
        s = carry
        step = jnp.ceil(l.astype(jnp.float32) / step_pow).astype(jnp.int32)
        cond = delta(i, i + (s + step) * d) > delta_node
        return jnp.where((step >= 1) & cond, s + step, s), None

    s, _ = jax.lax.scan(split_step, jnp.zeros(i.shape, jnp.int32),
                        2.0 ** jnp.arange(1, 26, dtype=jnp.float32))
    gamma = i + s * d + jnp.minimum(d, 0)  # split leaf index

    left_is_leaf = jnp.minimum(i, j) == gamma
    right_is_leaf = jnp.maximum(i, j) == gamma + 1
    # child ids: internal nodes 0..t-2, leaves t-1..2t-2 (leaf k -> t-1+k)
    left = jnp.where(left_is_leaf, t - 1 + gamma, gamma)
    right = jnp.where(right_is_leaf, t - 1 + gamma + 1, gamma + 1)

    num_nodes = 2 * t - 1
    first_all = jnp.concatenate([first, jnp.arange(t)])
    last_all = jnp.concatenate([last, jnp.arange(t)])
    left_all = jnp.concatenate([left, jnp.full((t,), -1)])
    right_all = jnp.concatenate([right, jnp.full((t,), -1)])
    is_leaf = jnp.arange(num_nodes) >= t - 1

    # --- bottom-up AABBs: parent = union(children), fixed-depth sweeps
    lo_sorted = tri_lo[order]
    hi_sorted = tri_hi[order]
    node_lo = jnp.where(is_leaf[:, None], jnp.concatenate(
        [jnp.full((t - 1, 3), jnp.inf), lo_sorted]), jnp.full((num_nodes, 3), jnp.inf))
    node_hi = jnp.where(is_leaf[:, None], jnp.concatenate(
        [jnp.full((t - 1, 3), -jnp.inf), hi_sorted]), jnp.full((num_nodes, 3), -jnp.inf))

    li = jnp.clip(left_all, 0, num_nodes - 1)
    ri = jnp.clip(right_all, 0, num_nodes - 1)

    def aabb_sweep(carry, _):
        lo, hi = carry
        new_lo = jnp.where(is_leaf[:, None], lo,
                           jnp.minimum(lo[li], lo[ri]))
        new_hi = jnp.where(is_leaf[:, None], hi,
                           jnp.maximum(hi[li], hi[ri]))
        return (new_lo, new_hi), None

    (node_lo, node_hi), _ = jax.lax.scan(
        aabb_sweep, (node_lo, node_hi), None, length=MAX_DEPTH
    )

    # --- preorder numbering: top-down sweeps
    # subtree sizes: internal [f,l] covers 2(l-f)+1 nodes; leaf = 1
    size = jnp.where(is_leaf, 1, 2 * (last_all - first_all) + 1)
    preorder = jnp.where(jnp.arange(num_nodes) == 0, 0, -1)

    def pre_sweep(carry, _):
        pre = carry
        # children of nodes with known preorder get theirs
        parent_known = (pre >= 0) & ~is_leaf
        lp = pre + 1
        rp = pre + 1 + size[li]
        new = pre
        # scatter: for each internal node, set left/right child preorders
        new = new.at[li].set(
            jnp.where(parent_known, lp, new[li]), mode="drop"
        )
        new = new.at[ri].set(
            jnp.where(parent_known, rp, new[ri]), mode="drop"
        )
        # never regress an already-known value
        return jnp.maximum(new, pre), None

    preorder, _ = jax.lax.scan(pre_sweep, preorder, None, length=MAX_DEPTH)

    skip = preorder + size

    # --- scatter into preorder slots
    out_min = jnp.zeros((num_nodes, 3), jnp.float32).at[preorder].set(node_lo)
    out_max = jnp.zeros((num_nodes, 3), jnp.float32).at[preorder].set(node_hi)
    out_next = jnp.zeros((num_nodes,), jnp.int32).at[preorder].set(skip)
    leaf_tri = jnp.where(is_leaf, first_all, -1)  # sorted-triangle index
    out_start = jnp.full((num_nodes,), -1, jnp.int32).at[preorder].set(leaf_tri)
    out_count = jnp.zeros((num_nodes,), jnp.int32).at[preorder].set(
        is_leaf.astype(jnp.int32)
    )

    # inflate degenerate AABBs (parity with the SAH builders)
    thin = (out_max - out_min) <= 0.0
    eps = 1e-6 * jnp.maximum(1.0, jnp.abs(out_min))
    out_min = jnp.where(thin, out_min - eps, out_min)
    out_max = jnp.where(thin, out_max + eps, out_max)

    return {
        "node_min": out_min,
        "node_max": out_max,
        "next_index": out_next,
        "tri_start": out_start,
        "tri_count": out_count,
        "order": order,
    }


def lbvh_to_flat(result):
    """Host-side FlatBVH view (leaf_k = 1) for tests/validation."""
    import numpy as np

    from pathtracerwithcuda_tpu.bvh.flatten import FlatBVH

    start = np.asarray(result["tri_start"])
    slots = start[:, None].astype(np.int32)
    return FlatBVH(
        node_min=np.asarray(result["node_min"]),
        node_max=np.asarray(result["node_max"]),
        next_index=np.asarray(result["next_index"]),
        tri_slots=np.where(slots >= 0, slots, -1),
    )
