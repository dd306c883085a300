"""Collapse a binary skip-link BVH into an 8-wide tree for the Pallas
wide-traversal kernel (ops/traversal_wide.py).

Why wide: the row-packet kernel advances each 128-ray row by ONE binary node
per scalar sync; an 8-wide node lets the same sync retire up to 8 child AABB
tests (one (8 children, 128 rays) slab test), cutting sync rounds by ~8x and
vector ops per retired box by ~2x.  This mirrors how the reference's
single-ray stackless walk (Kernel/path_tracer_kernel.cu:85-161) trades
per-node work for fewer memory round trips — except the TPU currency is
scalar-sync rounds, not memory latency.

The collapse consumes only the TOPOLOGY arrays (next_index, tri_start/count)
of the flattened binary BVH (bvh/flatten.py); child boxes are re-gathered
from the (possibly refitted) bvh_min/max at kernel-table pack time, so
transform refits (scene/build.py) need no wide-side rebuild.

Encoding of a wide node's 8 child slots:
  src[w, c]  = binary node id backing the slot (-1 empty)
  meta[w, c] = 0                     empty slot
             > 0: child wide id + 1  internal child
             < 0: -(start*64+count)  leaf child (contiguous triangle run)
"""

from __future__ import annotations

import dataclasses

import numpy as np

ARITY = 8


@dataclasses.dataclass
class WideBVH:
    """Host-side 8-wide BVH structure (boxes live with the binary arrays)."""

    src: np.ndarray   # (W, 8) i32 binary node id per slot, -1 empty
    meta: np.ndarray  # (W, 8) i32 encoded slot meta (see module docstring)
    max_stack: int    # exact worst-case traversal stack depth

    @property
    def num_wide(self) -> int:
        return self.src.shape[0]


def collapse_wide(next_index: np.ndarray, tri_start: np.ndarray,
                  tri_count: np.ndarray, arity: int = ARITY,
                  leaf_run_max: int = 0) -> WideBVH:
    """Greedy top-down collapse of the preorder/skip-link binary forest.

    Binary children of internal node i are (i+1, next_index[i+1]) — the
    preorder/skip-link identity.  Each wide node expands its backing binary
    node's subtree breadth-first, always splitting the slot with the largest
    preorder span (a proxy for subtree size), until `arity` slots or all
    slots are leaves.  Forest roots (multi-mesh concatenation,
    bvh/flatten.py::concatenate_bvhs) become slots of a virtual wide root;
    more than `arity` roots get grouped through intermediate wide nodes.

    leaf_run_max > 0 additionally terminates any slot whose SUBTREE holds at
    most that many triangles in one contiguous run (SAH/LBVH flattening
    orders triangles by preorder subtree, so small subtrees almost always
    are): the whole subtree becomes a single fat leaf slot.  Without this,
    bottom-of-tree wide nodes average ~2-4 filled slots (a binary node with
    two 8-triangle leaf children still costs a pop), which makes the walk
    iteration count — the Pallas kernel's serialization floor — far larger
    than the tree's span warrants.  Fat leaves trade cheap vector
    Möller–Trumbore work in the drain for those pops.
    """
    next_index = np.asarray(next_index, np.int64)
    tri_count = np.asarray(tri_count, np.int64)
    tri_start = np.asarray(tri_start, np.int64)
    n = next_index.shape[0]
    if n == 0:
        return WideBVH(src=np.zeros((0, arity), np.int32),
                       meta=np.zeros((0, arity), np.int32), max_stack=1)
    is_leaf = tri_count > 0

    if leaf_run_max > 0:
        if leaf_run_max > 63:
            raise ValueError("leaf_run_max > 63 breaks start*64+count packing")
        # bottom-up (reverse preorder) subtree triangle ranges: children of
        # internal i are (i+1, next_index[i+1])
        lo = np.where(is_leaf, tri_start, 0)
        hi = np.where(is_leaf, tri_start + tri_count, 0)
        tot = tri_count.copy()
        for i in range(n - 1, -1, -1):
            if not is_leaf[i]:
                a = i + 1
                b = int(next_index[a])
                lo[i] = min(lo[a], lo[b])
                hi[i] = max(hi[a], hi[b])
                tot[i] = tot[a] + tot[b]
        # a subtree is a mergeable run iff its leaves tile [lo, hi) exactly
        run_ok = (tot <= leaf_run_max) & (hi - lo == tot) & (tot > 0)
        term = is_leaf | run_ok
        run_start = np.where(is_leaf, tri_start, lo)
        run_count = np.where(is_leaf, tri_count, tot)
    else:
        term = is_leaf
        run_start, run_count = tri_start, tri_count

    def split_until(slots):
        """Split internal slots (largest span first) until arity slots."""
        slots = list(slots)
        while len(slots) < arity:
            best_span, best_i = 0, -1
            for idx, s in enumerate(slots):
                if not term[s]:
                    span = int(next_index[s] - s)
                    if span > best_span:
                        best_span, best_i = span, idx
            if best_i < 0:
                break
            s = slots[best_i]
            left = s + 1
            right = int(next_index[left])
            slots[best_i:best_i + 1] = [left, right]
        return slots

    # forest roots
    roots = []
    r = 0
    while r < n:
        roots.append(r)
        r = int(next_index[r])

    # >arity roots: one level of grouping through virtual slots.  A virtual
    # slot references another wide node instead of a binary node; its src is
    # encoded -2 - child_wide_id and its box at pack time is the hull of the
    # referenced row's slot boxes (pack_wide_tables fill pass).  One level
    # covers arity^2 = 64 mesh roots; beyond that callers fall back to the
    # binary skip-link kernel (render/wavefront._wide_ok catches this).
    if len(roots) > arity * arity:
        raise ValueError(
            f"{len(roots)} mesh roots > {arity * arity}; wide collapse "
            "supports one grouping level — use the binary kernel")

    src_rows: list[list[int]] = []
    meta_rows: list[np.ndarray] = []
    work: list[tuple[int, list[int]]] = []  # (wide id, slot binary ids)

    def reserve(slots) -> int:
        wid = len(src_rows)
        src_rows.append(slots)
        meta_rows.append(np.zeros(arity, np.int32))
        work.append((wid, slots))
        return wid

    depth_of = {0: 1}
    max_depth = 1
    if len(roots) == 1 and not term[roots[0]]:
        reserve(split_until([roots[0] + 1, int(next_index[roots[0] + 1])]))
    elif len(roots) <= arity:
        reserve(split_until(roots))
    else:
        # balanced groups of forest roots; each multi-root group becomes its
        # own wide node referenced by a virtual slot of the root row
        ngroups = -(-len(roots) // arity)
        groups = [roots[i::ngroups] for i in range(ngroups)]
        root_wid = len(src_rows)  # 0
        src_rows.append([])  # filled below
        meta_rows.append(np.zeros(arity, np.int32))
        root_srcs: list[int] = []
        for c, g in enumerate(groups):
            if len(g) == 1 and term[g[0]]:
                b = g[0]
                meta_rows[root_wid][c] = -(int(run_start[b]) * 64
                                           + int(run_count[b]))
                root_srcs.append(b)
                continue
            if len(g) == 1:
                b = g[0]
                cid = reserve(split_until([b + 1, int(next_index[b + 1])]))
                root_srcs.append(b)
            else:
                cid = reserve(split_until(list(g)))
                root_srcs.append(-2 - cid)  # virtual: hull of row cid
            meta_rows[root_wid][c] = cid + 1
            depth_of[cid] = 2
            max_depth = 2
        src_rows[root_wid] = root_srcs

    while work:
        wid, slots = work.pop()
        meta = meta_rows[wid]
        for c, b in enumerate(slots):
            if term[b]:
                meta[c] = -(int(run_start[b]) * 64 + int(run_count[b]))
            else:
                child_slots = split_until([b + 1, int(next_index[b + 1])])
                cid = reserve(child_slots)
                depth_of[cid] = depth_of[wid] + 1
                max_depth = max(max_depth, depth_of[cid])
                meta[c] = cid + 1

    w = len(src_rows)
    src = -np.ones((w, arity), np.int32)
    for i, slots in enumerate(src_rows):
        src[i, : len(slots)] = slots
    meta = np.stack(meta_rows, axis=0)
    # exact stack bound: root push + per level at most (arity - 1) deferred
    # siblings beyond the one being descended
    max_stack = 1 + (arity - 1) * (max_depth + 1)
    return WideBVH(src=src, meta=meta.astype(np.int32), max_stack=max_stack)


def validate_wide(wide: WideBVH, next_index, tri_start, tri_count) -> list:
    """Invariants: every binary leaf's triangle run appears exactly once;
    internal meta ids in range; src backs every non-empty slot."""
    errors = []
    tri_count = np.asarray(tri_count)
    tri_start = np.asarray(tri_start)
    runs = set()
    for w in range(wide.num_wide):
        for c in range(wide.src.shape[1]):
            m = int(wide.meta[w, c])
            b = int(wide.src[w, c])
            if m == 0:
                if b != -1:
                    errors.append(f"slot ({w},{c}): empty meta but src {b}")
                continue
            if b <= -2:  # virtual slot src=-2-cid must match meta=cid+1
                if m != -b - 1 or m <= 0:
                    errors.append(f"slot ({w},{c}): virtual src {b} but meta {m}")
                continue
            if b < 0:
                errors.append(f"slot ({w},{c}): meta {m} but no src")
                continue
            if m > 0:
                if not (0 < m <= wide.num_wide):
                    errors.append(f"slot ({w},{c}): internal id {m} oob")
            else:
                packed = -m
                start, count = packed // 64, packed % 64
                if count <= 0:
                    errors.append(f"slot ({w},{c}): leaf count 0")
                if (start, count) in runs:
                    errors.append(f"slot ({w},{c}): duplicate run {start}+{count}")
                runs.add((start, count))
                if int(tri_count[b]) > 0 and (
                        start != int(tri_start[b])
                        or count != int(tri_count[b])):
                    errors.append(f"slot ({w},{c}): run mismatch vs binary {b}")
    # every binary leaf's triangles appear in exactly one slot run (a slot
    # may merge a whole small subtree into one contiguous run — collapse
    # leaf_run_max — so compare triangle COVERAGE, not run identity)
    covered: list = []
    for s, c in runs:
        covered.extend(range(s, s + c))
    want_tris: list = []
    for s, c in zip(tri_start, tri_count):
        want_tris.extend(range(int(s), int(s) + int(c)))
    if sorted(covered) != sorted(want_tris):
        errors.append(
            f"leaf coverage mismatch: {len(covered)} slot tris vs "
            f"{len(want_tris)} binary leaf tris")
    return errors
