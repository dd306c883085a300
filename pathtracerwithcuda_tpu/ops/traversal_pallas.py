"""Pallas TPU row-packet traversal kernels — the hot path.

Why packets at all: TPU has no fast per-lane gather, so the XLA traversal
(ops/traversal.py), which gathers each lane's own BVH node every step, runs
at HBM random-access latency.  These kernels walk the skip-link BVH
(reference layout: Bvh/bvh.cpp:244-330, walk Kernel/path_tracer_kernel.cu:85-161)
with SHARED cursors, testing nodes against whole groups of rays with
broadcast vector ops and descending when ANY ray in the group hits.

**Row packets.**  The round-1 kernel used one cursor per 1024-ray block and
measured ~45 (8,128)-vector-ops per node visit; worse, an incoherent
1024-ray group visits the UNION of its rays' node sets — measured ~1/3 of
the whole tree per bounce-ray packet.  This kernel gives every sublane ROW
(128 rays) its OWN walk:

* one (8, 128) ray block = 8 independent row-walks;
* each step extracts EIGHT different nodes' AABBs (per-row dynamic tile
  load + lane mask + reduce), assembles them into per-row slab operands via
  an (8, 8) transpose, and runs ONE slab test for all 8 rows;
* the 8 per-row any-hit bits come back in a SINGLE vector→scalar sync
  (rows weighted by 2^row, max over lanes, sum over rows), so the scalar
  round trip (~240 ns on v5e) is amortized 8×;
* cursor updates are pure scalar ops on SMEM metadata.

Net: ~10 vector ops per node visit (4.5× less) over an 8× smaller
divergence domain.

**Segmented walk/intersect with best-t feedback** (unchanged from round 1's
design): walks append packed (tri start*64+count) leaf words to per-row SMEM
lists; every SEG_CAP entries the kernel switches to a Möller–Trumbore drain
whose loop bound is a scalar carry — zero syncs — updating per-lane
best_t/best_tri that the next walk segment's slab prune consumes.  Leaf
entries a row never filled are redirected to a zero-padded triangle slot
(det == 0 → guaranteed miss), so the drain needs no per-row masks.  The
feedback loop is also why no overflow/redo path exists: lists are drained
every SEG_CAP entries, nothing can clamp.

Leaf triangles are tested unmasked by per-lane AABB hits: a Möller–Trumbore
hit with 0 < t < best_t is valid for *every* lane in the row (the hit point
lies inside the leaf's AABB, so a per-ray walk with any not-yet-tighter
bound would have tested that leaf for that lane too), which keeps the phase
split sound and exact (closest hit, same contract as
ops.traversal.traverse_bvh).

Capacity: node AABBs / triangles in VMEM (~16 MB); node metadata (2 words:
skip link + packed start*64+count) and the per-row SEG_CAP-entry lists in
SMEM.  leaf_k (max triangles per leaf) must be <= 63 for the packed
encoding.

Each wavefront is dispatched in CHUNK_PACKETS-sized pieces so every call
compiles the SAME pallas executable; see render.wavefront for why the kernel
must additionally stay out of shape-varying XLA programs entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 8                     # sublane rows per block; each row = one walk
PACKET = ROWS * LANES        # rays per block (one full VPU register block)
CHAINS = 8                   # interleaved blocks per kernel instance
CHUNK_PACKETS = 64           # blocks per pallas dispatch (65536 rays)
SEG_CAP = 64                 # leaf-list entries per row per walk segment
MAX_LEAF_K = 63              # packed start*64+count encoding
INF = jnp.float32(jnp.inf)

# a padded/dead ray parks far outside any scene AABB so its slab tests miss
# everything (an origin inside the root box would otherwise pass the
# `near <= 0` bound test and drag its row through the whole tree)
FAR_ORIGIN = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _t8(m):
    """(8, 8) transpose — Mosaic lowers this natively and exactly (verified
    on v5e; a default-precision dot_general against an identity would round
    the operand to bf16 and corrupt box coordinates)."""
    return jnp.transpose(m)


def _slab(box6, o, inv_d, best_t):
    ox, oy, oz = o
    ix, iy, iz = inv_d
    tx0 = (box6[0] - ox) * ix
    ty0 = (box6[1] - oy) * iy
    tz0 = (box6[2] - oz) * iz
    tx1 = (box6[3] - ox) * ix
    ty1 = (box6[4] - oy) * iy
    tz1 = (box6[5] - oz) * iz
    near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                      jnp.maximum(tz0, tz1))
    return (near <= far) & (far > 0.0) & (near <= best_t)


def _extract_col(tile, lane, lane_ids, rows: int):
    """(R, 128) tile, scalar lane -> (R, 1) column of that lane's values."""
    onehot = lane_ids[:rows] == lane
    return jnp.sum(jnp.where(onehot, tile, 0.0), axis=1, keepdims=True)


def _rows_from_scalars(vals, row_ids, dtype):
    """8 scalars -> (8, 1) tile with vals[r] at row r."""
    acc = jnp.zeros((ROWS, 1), dtype)
    for r, v in enumerate(vals):
        acc = jnp.where(row_ids == r, jnp.asarray(v, dtype), acc)
    return acc


def _moller_trumbore_rows(f, ti_col, best_t, best_tri, o, d):
    """Test 8 triangles — row r's triangle against row r's 128 rays.

    f: 9 per-row-splat (8, 128) field tiles (v0 v1 v2 xyz); ti_col: (8, 1)
    triangle ids.  Pure vector ops — no branches, no scalar syncs.  Rows with
    nothing to test carry a zero-padded triangle (det == 0 → miss).
    """
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = f
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    # p = d × e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    det_ok = det != 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    # q = t × e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    b1 = (tx * px + ty * py + tz * pz) * inv_det
    b2 = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (det_ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
          & (t > 0.0) & (t < best_t))
    best_t = jnp.where(ok, t, best_t)
    best_tri = jnp.where(ok, jnp.broadcast_to(ti_col, best_tri.shape), best_tri)
    return best_t, best_tri


# --------------------------------------------------------------------------
# segmented row-walk + intersect kernel
# --------------------------------------------------------------------------


def _kernel(meta_ref, ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
            seed_ref, dx_ref, dy_ref, dz_ref, nbox_ref, tri_ref, out_t_ref,
            out_tri_ref, list_ref, bt_ref, btri_ref, *, num_nodes: int,
            pad_tri: int, chains: int, leaf_k: int, walk_only: bool = False):
    """`chains` blocks of 8 interleaved row-walks + masked leaf intersection.

    meta_ref (SMEM, 2N i32): [2n]=skip link, [2n+1]=tri start*64 + count.
    Ray fields arrive as TEN separate (C, 8, 128) refs (origin xyz, inverse
    direction xyz, seed bound, direction xyz) so the host-side packing is a
    pure reshape — interleaving them into one (C, 10, 8, 128) block would
    cost a 60 MB relayout transpose per dispatch at 1080p.
    Seed bound = closest sphere t; 0 = dead lane.
    nbox_ref (NT, 8, 128) f32: AABB field q of node t*128+l (q: 0-2 min,
                             3-5 max).
    list_ref (SMEM scratch, (C, 8, SEG_CAP+1) i32): per-row packed leaf words.
    bt_ref / btri_ref (VMEM scratch, (C, 8, 128)): running best_t / best_tri,
                             read by the walk's slab prune every visit.
    pad_tri: index of a zero-padded (degenerate) triangle slot — the masked
             drain redirects inactive (row, k) tests there.
    """
    nn = jnp.int32(num_nodes)
    nw = chains * ROWS  # total row-walks
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    row_w = jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0))

    os_ = [[ox_ref[i], oy_ref[i], oz_ref[i]] for i in range(chains)]
    invs = [[ix_ref[i], iy_ref[i], iz_ref[i]] for i in range(chains)]

    for i in range(chains):
        bt_ref[i] = seed_ref[i]
        btri_ref[i] = jnp.full((ROWS, LANES), -1, jnp.int32)

    def outer_cond(poss):
        alive = poss[0] < nn
        for w in range(1, nw):
            alive = alive | (poss[w] < nn)
        return alive

    def outer_body(poss):
        # ---- walk segment: advance every unfinished row until its leaf
        # list holds SEG_CAP entries (or its walk completes)
        def wcond(c):
            alive = (c[0] < nn) & (c[nw] < SEG_CAP)
            for w in range(1, nw):
                alive = alive | ((c[w] < nn) & (c[nw + w] < SEG_CAP))
            return alive

        def wbody(c):
            ps = list(c[:nw])
            cs = list(c[nw:])
            for i in range(chains):
                nodes = [jnp.minimum(ps[i * ROWS + r], nn - 1)
                         for r in range(ROWS)]
                cols = [
                    _extract_col(nbox_ref[n // LANES], jax.lax.rem(n, LANES),
                                 lane_ids, ROWS)
                    for n in nodes
                ]
                m = jnp.concatenate(cols, axis=1)       # (8, 8) [field, row]
                mt = _t8(m)                             # (8, 8) [row, field]
                box6 = [jnp.broadcast_to(mt[:, q:q + 1], (ROWS, LANES))
                        for q in range(6)]
                hit = _slab(box6, os_[i], invs[i], bt_ref[i])  # (8, 128)
                # 8 per-row any-hit bits in ONE scalar sync
                bits = jnp.sum(jnp.max(jnp.where(hit, row_w, 0), axis=1,
                                       keepdims=True))
                for r in range(ROWS):
                    w = i * ROWS + r
                    pos, cur = ps[w], cs[w]
                    node = nodes[r]
                    stepping = (pos < nn) & (cur < SEG_CAP)
                    any_hit = (jax.lax.shift_right_logical(
                        bits, jnp.int32(r)) & 1) > 0
                    any_hit = any_hit & stepping
                    nxt = meta_ref[2 * node]
                    packed = meta_ref[2 * node + 1]
                    count = jax.lax.rem(packed, 64)
                    is_leaf_hit = any_hit & (count > 0)
                    # unconditional store at the cursor: non-leaf iterations
                    # write garbage there, overwritten by the next leaf hit /
                    # never read (the drain is bounded by the cursor).  Rows
                    # stalled at cur == SEG_CAP park writes in the spare
                    # SEG_CAP slot so they cannot clobber a live entry.
                    list_ref[i, r, cur] = packed
                    cs[w] = cur + jnp.where(is_leaf_hit, 1, 0)
                    ps[w] = jnp.where(stepping,
                                      jnp.where(any_hit, pos + 1, nxt), pos)
            return tuple(ps) + tuple(cs)

        init = tuple(poss) + tuple(jnp.int32(0) for _ in range(nw))
        walked = jax.lax.while_loop(wcond, wbody, init)

        # ---- intersect segment: drain all rows' lists in lockstep,
        # inactive (row, entry, k) slots redirected to the pad triangle
        if walk_only:  # timing diagnostics only — results are wrong
            return walked[:nw]
        for i in range(chains):
            d = [dx_ref[i], dy_ref[i], dz_ref[i]]
            ns = [walked[nw + i * ROWS + r] for r in range(ROWS)]
            nmax = ns[0]
            for r in range(1, ROWS):
                nmax = jnp.maximum(nmax, ns[r])

            def mt_body(l, carry, i=i, d=d, ns=ns):
                starts, counts = [], []
                kmax = jnp.int32(0)
                for r in range(ROWS):
                    packed = jnp.where(l < ns[r],
                                       list_ref[i, r, jnp.minimum(l, SEG_CAP - 1)],
                                       0)
                    start = packed // 64
                    count = packed - start * 64
                    counts.append(count)
                    starts.append(start)
                    kmax = jnp.maximum(kmax, count)

                def k_body(k, carry2, i=i, d=d):
                    best_t, best_tri = carry2
                    tis = [jnp.where(k < counts[r], starts[r] + k, pad_tri)
                           for r in range(ROWS)]
                    cols = [
                        _extract_col(tri_ref[ti // LANES],
                                     jax.lax.rem(ti, LANES), lane_ids, 16)
                        for ti in tis
                    ]
                    c16 = jnp.concatenate(cols, axis=1)   # (16, 8)
                    t_lo = _t8(c16[0:8])                  # (8, 8) fields 0-7
                    t_hi = _t8(c16[8:16])                 # (8, 8) fields 8-15
                    f = [jnp.broadcast_to(t_lo[:, q:q + 1], (ROWS, LANES))
                         for q in range(8)]
                    f.append(jnp.broadcast_to(t_hi[:, 0:1], (ROWS, LANES)))
                    ti_col = _rows_from_scalars(tis, row_ids, jnp.int32)
                    return _moller_trumbore_rows(
                        f, ti_col, best_t, best_tri, os_[i], d)

                return jax.lax.fori_loop(0, kmax, k_body, carry)

            best_t, best_tri = jax.lax.fori_loop(
                0, nmax, mt_body, (bt_ref[i], btri_ref[i]))
            bt_ref[i] = best_t
            btri_ref[i] = best_tri
        return walked[:nw]

    jax.lax.while_loop(outer_cond, outer_body,
                       tuple(jnp.int32(0) for _ in range(nw)))
    for i in range(chains):
        out_t_ref[i] = bt_ref[i]
        out_tri_ref[i] = btri_ref[i]
        # pad-triangle hits can only come from redirected (inactive) slots
        # with det == 0, which never pass the hit test — no cleanup needed


@functools.partial(jax.jit, static_argnames=("num_nodes", "pad_tri", "leaf_k",
                                             "chains", "interpret", "walk_only"))
def _run(fields, nbox, meta, tris, num_nodes: int, pad_tri: int,
         leaf_k: int, chains: int, interpret: bool = False,
         walk_only: bool = False):
    """fields: 10 arrays (num_packets, 8, 128): ox oy oz ix iy iz seed dx dy dz."""
    num_packets = fields[0].shape[0]
    grid = num_packets // chains
    kernel = functools.partial(_kernel, num_nodes=num_nodes, pad_tri=pad_tri,
                               chains=chains, leaf_k=leaf_k,
                               walk_only=walk_only)
    block = pl.BlockSpec((chains, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_t, out_tri = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [block] * 10
        + [
            pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[block, block],
        out_shape=[
            jax.ShapeDtypeStruct((num_packets, ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_packets, ROWS, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((chains, ROWS, SEG_CAP + 1), jnp.int32),
            pltpu.VMEM((chains, ROWS, LANES), jnp.float32),
            pltpu.VMEM((chains, ROWS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, *fields, nbox, tris)
    return out_t, out_tri


# --------------------------------------------------------------------------
# packing + public API
# --------------------------------------------------------------------------


def pack_scene_tables(bvh_min, bvh_max, bvh_next, bvh_tri_start,
                      bvh_tri_count, tri_v0, tri_v1, tri_v2, leaf_k: int):
    """Device-side packing into the kernel table layouts.

    Returns (nbox VMEM f32 (NT,8,128), meta SMEM i32 (2N,),
    tris VMEM f32 (TT,16,128)).
    """
    if leaf_k > MAX_LEAF_K:
        raise ValueError(f"leaf_k {leaf_k} > {MAX_LEAF_K} (packed encoding)")
    n = bvh_min.shape[0]
    t = tri_v0.shape[0]
    n_pad = _round_up(max(n, 1), LANES)
    t_pad = _round_up(t + leaf_k, LANES)

    nbox = jnp.zeros((8, n_pad), jnp.float32)
    nbox = nbox.at[0:3, :n].set(bvh_min.T)
    nbox = nbox.at[3:6, :n].set(bvh_max.T)
    nbox = nbox.reshape(8, n_pad // LANES, LANES).transpose(1, 0, 2)

    meta = jnp.zeros((2, n), jnp.int32)
    meta = meta.at[0, :].set(bvh_next)
    meta = meta.at[1, :].set(jnp.maximum(bvh_tri_start, 0) * 64 + bvh_tri_count)
    meta = meta.T.reshape(2 * n)

    tris = jnp.zeros((16, t_pad), jnp.float32)
    tris = tris.at[0:3, :t].set(tri_v0.T)
    tris = tris.at[3:6, :t].set(tri_v1.T)
    tris = tris.at[6:9, :t].set(tri_v2.T)
    tris = tris.reshape(16, t_pad // LANES, LANES).transpose(1, 0, 2)
    return nbox, meta, tris


def vmem_table_bytes(num_nodes: int, num_tris: int, leaf_k: int) -> int:
    """VMEM footprint of the scene tables (node boxes + triangles) plus the
    per-chain best_t/best_tri scratch."""
    n_pad = _round_up(max(num_nodes, 1), LANES)
    t_pad = _round_up(num_tris + leaf_k, LANES)
    return 8 * n_pad * 4 + 16 * t_pad * 4 + 2 * CHAINS * PACKET * 4


def smem_meta_bytes(num_nodes: int) -> int:
    """SMEM footprint: node metadata + per-row segment lists."""
    return 2 * max(num_nodes, 1) * 4 + CHAINS * ROWS * SEG_CAP * 4


def traverse_packed(origin, direction, min_t0, tables, *, num_nodes: int,
                    num_tris: int, leaf_k: int, chains: int = CHAINS,
                    interpret: bool = False, walk_only: bool = False):
    """Packet traversal with PREPACKED scene tables (pack_scene_tables) —
    the production path packs tables once per trace instead of once per
    bounce.  origin/direction (P, 3), min_t0 (P,); P must be a multiple of
    CHUNK_PACKETS*PACKET (render.wavefront pads the wavefront).

    All host-side ray marshalling is elementwise + pure reshapes: the ray
    fields go to the kernel as ten separate arrays (see _kernel docstring).
    Returns (tri_index, t) with -1/inf for no triangle beating min_t0.
    """
    nbox, meta, tris = tables
    p = origin.shape[0]
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    min_t0 = jax.lax.stop_gradient(min_t0)

    # dead lanes (seed bound 0) park far away so they cannot pass the slab
    # test and force row descends (their origin may be inside the scene)
    dead = min_t0 <= 0.0
    o = jnp.where(dead[:, None], FAR_ORIGIN, origin)
    d = jnp.where(direction == 0.0, 1e-20, direction)
    inv_d = 1.0 / d

    num_packets = p // PACKET
    n_chunks = num_packets // CHUNK_PACKETS

    def shatter(x):  # (P,) -> (n_chunks, CHUNK_PACKETS, 8, 128), reshape-only
        return x.reshape(n_chunks, CHUNK_PACKETS, ROWS, LANES)

    fields = [shatter(o[:, 0]), shatter(o[:, 1]), shatter(o[:, 2]),
              shatter(inv_d[:, 0]), shatter(inv_d[:, 1]), shatter(inv_d[:, 2]),
              shatter(min_t0),
              shatter(d[:, 0]), shatter(d[:, 1]), shatter(d[:, 2])]
    outs = [
        _run([f[c] for f in fields], nbox, meta, tris, num_nodes=num_nodes,
             pad_tri=num_tris, leaf_k=leaf_k, chains=chains,
             interpret=interpret, walk_only=walk_only)
        for c in range(n_chunks)
    ]
    out_t = jnp.concatenate([o_[0] for o_ in outs], axis=0)
    out_tri = jnp.concatenate([o_[1] for o_ in outs], axis=0)
    best_t = out_t.reshape(p)
    best_tri = out_tri.reshape(p)
    best_t = jnp.where(best_tri >= 0, best_t, INF)
    return best_tri, best_t


def traverse_bvh_packets(origin, direction, bvh_min, bvh_max, bvh_next,
                         bvh_tri_start, bvh_tri_count, tri_v0, tri_v1, tri_v2,
                         min_t0=None, *, leaf_k: int, chains: int = CHAINS,
                         interpret: bool = False):
    """Drop-in packet-kernel analog of ops.traversal.traverse_bvh.

    origin/direction (P, 3); P padded to a multiple of 1024*chains internally.
    leaf_k: static max triangles per leaf (SceneData.leaf_size; must be <= 63
    for the packed start*64+count encoding).
    Returns (tri_index, t) with -1/inf for no triangle beating min_t0.
    """
    p = origin.shape[0]
    num_nodes = bvh_min.shape[0]
    num_tris = tri_v0.shape[0]
    if min_t0 is None:
        min_t0 = jnp.full((p,), INF)

    if num_nodes == 0:
        return jnp.full((p,), -1, jnp.int32), jnp.full((p,), INF)

    # Fixed-size chunks: every wavefront size runs the SAME pallas executable
    # (same grid, same block shapes).  Two differently-shaped instances of
    # this kernel in one process poison each other on re-execution (axon/
    # Mosaic backend bug — second execution of the second shape returns
    # InvalidArgument), and constant shapes also bound compile count.
    chunk_rays = CHUNK_PACKETS * PACKET
    p_pad = _round_up(p, chunk_rays)
    pad = p_pad - p
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)),
                         constant_values=FAR_ORIGIN)
        direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        min_t0 = jnp.pad(min_t0, ((0, pad),))

    tables = pack_scene_tables(
        bvh_min, bvh_max, bvh_next, bvh_tri_start, bvh_tri_count,
        tri_v0, tri_v1, tri_v2, leaf_k,
    )
    best_tri, best_t = traverse_packed(
        origin, direction, min_t0, tables, num_nodes=num_nodes,
        num_tris=num_tris, leaf_k=leaf_k, chains=chains, interpret=interpret)
    return best_tri[:p], best_t[:p]
