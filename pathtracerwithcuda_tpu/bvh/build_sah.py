"""Host bucketed-SAH BVH builder (NumPy).

Fills the role of the reference's builder trio (naive bucketed-SAH CPU
Bvh/bvh.cpp:3-357, Morton CPU :359-808, Morton CUDA :810-1068).  BVH builds
are per-scene-load, not per-frame, so a host builder is the right tool; the
jittable LBVH (bvh/build_lbvh.py) covers on-device rebuild parity.

Split policy per node (as the reference's naive builder, Bvh/bvh.cpp:41-131):
bucket centroids along each axis into <= `num_buckets` bins, take the split
minimizing SA_left * n_left + SA_right * n_right, fall back to a median split
when bucketing fails to separate; emit a leaf at <= `leaf_size` triangles.

Output is directly the flattened skip-link layout (emitted in preorder during
the explicit-stack DFS, so no separate flatten pass is needed).

A degenerate ("thin") child AABB is inflated to a small epsilon box like the
reference inflates thin leaves to their parent (Bvh/bvh.cpp:265-268) so the
slab test can't divide 0 by 0.
"""

from __future__ import annotations

import numpy as np

from pathtracerwithcuda_tpu.bvh.flatten import FlatBVH


def triangle_aabbs(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return lo.astype(np.float32), hi.astype(np.float32)


def _surface_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    # reference uses 2*x*y*z (a volume-like metric, Bvh/bounding_box.h:63-66);
    # we use the standard half-surface-area which is strictly better SAH
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]


def build_sah_bvh(
    v0: np.ndarray,
    v1: np.ndarray,
    v2: np.ndarray,
    leaf_size: int = 4,
    num_buckets: int = 12,
) -> FlatBVH:
    """Build over triangles given as (T, 3) vertex arrays."""
    t = v0.shape[0]
    if t == 0:
        return FlatBVH.empty(leaf_size)

    lo, hi = triangle_aabbs(v0, v1, v2)
    centroid = 0.5 * (lo + hi)

    node_min, node_max, node_next, node_tris = [], [], [], []

    def emit(ids, is_leaf):
        i = len(node_min)
        node_min.append(np.min(lo[ids], axis=0))
        node_max.append(np.max(hi[ids], axis=0))
        node_next.append(-1)  # patched later
        if is_leaf:
            slot = -np.ones(leaf_size, np.int32)
            slot[: len(ids)] = ids
            node_tris.append(slot)
        else:
            node_tris.append(-np.ones(leaf_size, np.int32))
        return i

    # Iterative preorder with subtree-end patching: process (ids, parent_done)
    # frames; when a frame is popped we know all earlier frames' nodes exist.
    # We use the classic trick: push a "close" marker holding the node id.
    work = [("open", np.arange(t, dtype=np.int64))]
    while work:
        tag, payload = work.pop()
        if tag == "close":
            node_next[payload] = len(node_min)
            continue
        ids = payload
        n = len(ids)
        if n <= leaf_size:
            i = emit(ids, True)
            node_next[i] = -2  # leaf: skip = own index + 1, patched below
            continue

        i = emit(ids, False)
        work.append(("close", i))

        c = centroid[ids]
        c_lo = np.min(c, axis=0)
        c_hi = np.max(c, axis=0)
        extent = c_hi - c_lo

        best = None  # (cost, axis, left_mask)
        for axis in range(3):
            if extent[axis] <= 0.0:
                continue
            b = min(num_buckets, max(2, n))
            # bucket index in [0, b)
            scaled = (c[:, axis] - c_lo[axis]) / extent[axis] * b
            bucket = np.minimum(scaled.astype(np.int64), b - 1)
            # prefix AABBs over buckets
            counts = np.bincount(bucket, minlength=b)
            if np.count_nonzero(counts) < 2:
                continue
            bl = np.full((b, 3), np.inf, np.float32)
            bh = np.full((b, 3), -np.inf, np.float32)
            np.minimum.at(bl, bucket, lo[ids])
            np.maximum.at(bh, bucket, hi[ids])
            pre_lo = np.minimum.accumulate(bl, axis=0)
            pre_hi = np.maximum.accumulate(bh, axis=0)
            suf_lo = np.minimum.accumulate(bl[::-1], axis=0)[::-1]
            suf_hi = np.maximum.accumulate(bh[::-1], axis=0)[::-1]
            n_left = np.cumsum(counts)[:-1]
            n_right = n - n_left
            valid = (n_left > 0) & (n_right > 0)
            cost = np.where(
                valid,
                _surface_area(pre_lo[:-1], pre_hi[:-1]) * n_left
                + _surface_area(suf_lo[1:], suf_hi[1:]) * n_right,
                np.inf,
            )
            j = int(np.argmin(cost))
            if np.isfinite(cost[j]) and (best is None or cost[j] < best[0]):
                best = (cost[j], bucket <= j)

        if best is None:
            # all centroids coincide: median split by index
            half = n // 2
            left_mask = np.zeros(n, bool)
            left_mask[:half] = True
        else:
            left_mask = best[1]

        # right pushed first so left is emitted next (preorder)
        work.append(("open", ids[~left_mask]))
        work.append(("open", ids[left_mask]))

    n_nodes = len(node_min)
    nxt = np.asarray(node_next, np.int64)
    leaf = nxt == -2
    nxt[leaf] = np.nonzero(leaf)[0] + 1

    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    # inflate degenerate extents so 1/direction slab tests stay finite
    thin = (node_max - node_min) <= 0.0
    eps = 1e-6 * np.maximum(1.0, np.abs(node_min))
    node_min = np.where(thin, node_min - eps, node_min)
    node_max = np.where(thin, node_max + eps, node_max)

    return FlatBVH(
        node_min=node_min,
        node_max=node_max,
        next_index=nxt.astype(np.int32),
        tri_slots=np.asarray(node_tris, np.int32).reshape(n_nodes, leaf_size),
    )
