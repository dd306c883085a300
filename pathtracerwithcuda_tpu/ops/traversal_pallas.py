"""Pallas TPU packet-traversal kernels — the hot path.

Why a packet design: TPU has no fast per-lane gather, so the XLA traversal
(ops/traversal.py), which gathers each lane's own BVH node every step, runs
at HBM random-access latency.  Instead these kernels walk the skip-link BVH
(reference layout: Bvh/bvh.cpp:244-330, walk Kernel/path_tracer_kernel.cu:85-161)
with ONE shared preorder cursor per packet of 1024 rays, testing each node's
AABB against the whole packet with broadcast vector ops and descending when
ANY lane hits.  Measured-on-v5e rules that shape the design:

* A (1, 128) op costs the same cycle as an (8, 128) op → packets are 8x128 =
  1024 rays (one full VPU register block per ray field).  Packets are 32x32
  pixel tiles (render.wavefront render_order) so primary packets stay
  coherent; bounced rays are compacted + octant-sorted by the caller.
* One walk serializes on a vector→scalar `any(hit)` round trip per node
  (~240 ns — the VPU pipeline + scalar-unit sync), so the walk kernel
  interleaves CHAINS independent packets; their latencies overlap (~6x).
* `lax.cond` in the loop body costs ~6x even when not taken — everything is
  branchless selects.
* Node metadata and the leaf lists live in SMEM: scalar loads/stores, no
  vector↔scalar traffic.

**Segmented walk/intersect with best-t feedback.**  A single fused walk pays
the slab AND the triangle test on every iteration (each masked off half the
time).  Instead the kernel alternates two phases per packet chain:

1. Walk segment — traversal only: slab tests against the whole packet,
   pruned by each lane's CURRENT best_t (seeded with the closest sphere,
   tightened by every intersect segment), appending each leaf-hit's packed
   (tri start, count) word to the chain's SMEM-scratch list.  The segment
   ends when the list holds SEG_CAP entries (or the walk finishes).
2. Intersect segment — a `fori` over the list running masked Möller–Trumbore,
   tri-at-a-time against all 1024 rays, updating per-lane best_t/best_tri
   scratch.  The loop bound is a scalar carry, so the body has ZERO scalar
   syncs and pipelines at full VPU throughput.

The feedback loop is why this beats a collect-everything-then-intersect
split: after the first segment resolves the near geometry, the tightened
bounds prune most of the remaining tree.  It also removes the round-1
overflow hazard by construction — the list is drained every SEG_CAP entries,
so no leaf set can clamp and no XLA-walk redo pass exists.

Leaf triangles are tested unmasked by per-lane AABB hits: a Möller–Trumbore
hit with 0 < t < best_t is valid for *every* lane (the hit point lies inside
the leaf's AABB, so a per-ray walk with any not-yet-tighter bound would have
tested that leaf for that lane too), which is what makes the phase split
sound and exact (closest hit, same contract as ops.traversal.traverse_bvh).

Capacity: node AABBs / triangles in VMEM (~16 MB); node metadata (2 words:
skip link + packed start*64+count) and the SEG_CAP-entry lists in SMEM.
leaf_k (max triangles per leaf) must be <= 63 for the packed encoding.

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
ROWS = 8                     # sublane rows per packet
PACKET = ROWS * LANES        # rays per packet (one full VPU register block)
CHAINS = 16                  # interleaved walks per kernel instance
CHUNK_PACKETS = 128          # packets per pallas dispatch (131072 rays)
SEG_CAP = 256                # leaf-list entries per walk segment (SMEM)
MAX_LEAF_K = 63              # packed start*64+count encoding
INF = jnp.float32(jnp.inf)

# a padded/dead ray parks far outside any scene AABB so its packet-side slab
# tests miss everything (origin inside the root box would otherwise pass the
# `near <= 0` bound test and drag the packet through the whole tree)
FAR_ORIGIN = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _extract_fields(tile, lane, rows):
    """(R, 128) tile, scalar lane -> `rows` (1, 128) lane-splat field values.

    Mosaic cannot broadcast (1, 1) -> (8, 128) in one op ("broadcast in both
    sublanes and lanes"), so each field is returned pre-splat across lanes;
    arithmetic against (8, 128) ray blocks then only broadcasts sublanes.
    """
    onehot = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) == lane
    col = jnp.sum(jnp.where(onehot, tile, 0), axis=1, keepdims=True)
    return [jnp.broadcast_to(col[r:r + 1, :], (1, LANES)) for r in range(rows)]


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


def _moller_trumbore_one(tri_ref, ti, active, best_t, best_tri, o, d):
    """Test ONE triangle (scalar index ti, scalar mask `active`) vs a packet.

    Pure vector ops — no branches, no scalar syncs.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    f = _extract_fields(tri_ref[ti // LANES], jax.lax.rem(ti, LANES), 9)
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
          & (t > 0.0) & (t < best_t) & active)
    best_t = jnp.where(ok, t, best_t)
    best_tri = jnp.where(ok, ti, best_tri)
    return best_t, best_tri


# --------------------------------------------------------------------------
# segmented walk + intersect kernel
# --------------------------------------------------------------------------


def _kernel(meta_ref, ray_ref, dir_ref, nbox_ref, tri_ref, out_t_ref,
            out_tri_ref, list_ref, bt_ref, btri_ref, *, num_nodes: int,
            chains: int, leaf_k: int):
    """`chains` interleaved packet walks alternating with leaf intersection.

    meta_ref (SMEM, 2N i32): [2n]=skip link, [2n+1]=tri start*64 + count.
    ray_ref  (C, 7, 8, 128): fields 0-2 origin, 3-5 inverse direction,
                             6 seed bound (closest sphere; 0 = dead lane).
    dir_ref  (C, 3, 8, 128): fields 0-2 direction.
    nbox_ref (NT, 8, 128) f32: AABB field q of node t*128+l (q: 0-2 min,
                             3-5 max).
    list_ref (SMEM scratch, (C, SEG_CAP) i32): per-chain packed leaf words.
    bt_ref / btri_ref (VMEM scratch, (C, 8, 128)): running best_t / best_tri,
                             read by the walk's slab prune every visit.
    """
    nn = jnp.int32(num_nodes)
    os_ = [[ray_ref[i, f] for f in range(3)] for i in range(chains)]
    invs = [[ray_ref[i, 3 + f] for f in range(3)] for i in range(chains)]

    for i in range(chains):
        bt_ref[i] = ray_ref[i, 6]
        btri_ref[i] = jnp.full((ROWS, LANES), -1, jnp.int32)

    def outer_cond(poss):
        alive = poss[0] < nn
        for i in range(1, chains):
            alive = alive | (poss[i] < nn)
        return alive

    def outer_body(poss):
        # ---- walk segment: advance every unfinished chain until its leaf
        # list holds SEG_CAP entries (or its walk completes)
        def wcond(c):
            alive = (c[0] < nn) & (c[chains] < SEG_CAP)
            for i in range(1, chains):
                alive = alive | ((c[i] < nn) & (c[chains + i] < SEG_CAP))
            return alive

        def wbody(c):
            ps = list(c[:chains])
            cs = list(c[chains:])
            for i in range(chains):
                pos, cur = ps[i], cs[i]
                step = (pos < nn) & (cur < SEG_CAP)
                node = jnp.minimum(pos, nn - 1)
                box6 = _extract_fields(nbox_ref[node // LANES],
                                       jax.lax.rem(node, LANES), 6)
                lane_hit = _slab(box6, os_[i], invs[i], bt_ref[i])
                any_hit = jnp.any(lane_hit) & step
                nxt = meta_ref[2 * node]
                packed = meta_ref[2 * node + 1]
                count = jax.lax.rem(packed, 64)
                is_leaf_hit = any_hit & (count > 0)
                # unconditional store: non-leaf iterations write garbage at
                # the cursor, overwritten by the next leaf hit / never read
                list_ref[i, jnp.minimum(cur, SEG_CAP - 1)] = packed
                cs[i] = cur + jnp.where(is_leaf_hit, 1, 0)
                ps[i] = jnp.where(step, jnp.where(any_hit, pos + 1, nxt), pos)
            return tuple(ps) + tuple(cs)

        init = tuple(poss) + tuple(jnp.int32(0) for _ in range(chains))
        walked = jax.lax.while_loop(wcond, wbody, init)

        # ---- intersect segment: drain each chain's list, tighten best_t
        for i in range(chains):
            d = [dir_ref[i, f] for f in range(3)]
            n = walked[chains + i]

            def mt_body(l, carry, i=i, d=d):
                best_t, best_tri = carry
                packed = list_ref[i, l]
                start = packed // 64
                count = packed - start * 64
                for k in range(leaf_k):
                    best_t, best_tri = _moller_trumbore_one(
                        tri_ref, start + k, k < count, best_t, best_tri,
                        os_[i], d)
                return best_t, best_tri

            best_t, best_tri = jax.lax.fori_loop(
                0, n, mt_body, (bt_ref[i], btri_ref[i]))
            bt_ref[i] = best_t
            btri_ref[i] = best_tri
        return walked[:chains]

    jax.lax.while_loop(outer_cond, outer_body,
                       tuple(jnp.int32(0) for _ in range(chains)))
    for i in range(chains):
        out_t_ref[i] = bt_ref[i]
        out_tri_ref[i] = btri_ref[i]


@functools.partial(jax.jit, static_argnames=("num_nodes", "leaf_k", "chains",
                                             "interpret"))
def _run(rays, dirs, nbox, meta, tris, num_nodes: int, leaf_k: int,
         chains: int, interpret: bool = False):
    num_packets = rays.shape[0]
    grid = num_packets // chains
    kernel = functools.partial(_kernel, num_nodes=num_nodes, chains=chains,
                               leaf_k=leaf_k)
    out_t, out_tri = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chains, 7, ROWS, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chains, 3, ROWS, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chains, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chains, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_packets, ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_packets, ROWS, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((chains, SEG_CAP), jnp.int32),
            pltpu.VMEM((chains, ROWS, LANES), jnp.float32),
            pltpu.VMEM((chains, ROWS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, rays, dirs, nbox, tris)
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
    """SMEM footprint: node metadata + per-chain segment lists."""
    return 2 * max(num_nodes, 1) * 4 + CHAINS * SEG_CAP * 4


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
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    if min_t0 is None:
        min_t0 = jnp.full((p,), INF)
    else:
        min_t0 = jax.lax.stop_gradient(min_t0)

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

    # dead lanes (seed bound 0) park far away so they cannot pass the slab
    # test and force packet descends (their origin may be inside the scene)
    dead = min_t0 <= 0.0
    o = jnp.where(dead[:, None], FAR_ORIGIN, origin)
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)), constant_values=FAR_ORIGIN)
    d = jnp.where(direction == 0.0, 1e-20, direction)
    if pad:
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    seed = jnp.pad(min_t0, ((0, pad),)) if pad else min_t0

    inv_d = 1.0 / d
    num_packets = p_pad // PACKET
    rays = jnp.concatenate([o, inv_d, seed[:, None]], axis=1)  # (P, 7)
    rays = rays.reshape(num_packets, ROWS, LANES, 7).transpose(0, 3, 1, 2)
    dirs = d.reshape(num_packets, ROWS, LANES, 3).transpose(0, 3, 1, 2)

    nbox, meta, tris = pack_scene_tables(
        bvh_min, bvh_max, bvh_next, bvh_tri_start, bvh_tri_count,
        tri_v0, tri_v1, tri_v2, leaf_k,
    )
    n_chunks = num_packets // CHUNK_PACKETS
    rays = rays.reshape(n_chunks, CHUNK_PACKETS, 7, ROWS, LANES)
    dirs = dirs.reshape(n_chunks, CHUNK_PACKETS, 3, ROWS, LANES)
    outs = [
        _run(rays[c], dirs[c], nbox, meta, tris, num_nodes=num_nodes,
             leaf_k=leaf_k, chains=chains, interpret=interpret)
        for c in range(n_chunks)
    ]
    out_t = jnp.concatenate([o[0] for o in outs], axis=0)
    out_tri = jnp.concatenate([o[1] for o in outs], axis=0)
    best_t = out_t.reshape(p_pad)[:p]
    best_tri = out_tri.reshape(p_pad)[:p]
    best_t = jnp.where(best_tri >= 0, best_t, INF)
    return best_tri, best_t
