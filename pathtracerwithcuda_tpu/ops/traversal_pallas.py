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
  coherent; bounced rays should be compacted + sorted by the caller.
* One walk serializes on a vector→scalar `any(hit)` round trip per node
  (~240 ns — the VPU pipeline + scalar-unit sync), so the walk kernel
  interleaves CHAINS independent packets; their latencies overlap (~6x).
* `lax.cond` in the loop body costs ~6x even when not taken — everything is
  branchless selects.
* Node metadata and the leaf lists live in SMEM: scalar loads/stores, no
  vector↔scalar traffic.

**Two phases in one kernel.**  A single fused walk pays the slab AND the
triangle test on every iteration (each masked off half the time).  Instead,
per kernel instance:

1. Walk — traversal only: slab tests against the whole packet, prunes with
   the caller's seed bound (closest sphere), and appends each leaf-hit's
   (tri start, count) to the packet's SMEM-scratch list.  No best_t feedback
   (a strict superset of the pruned visit set — results identical).
2. Intersect — a `fori` over each packet's leaf list running masked
   Möller–Trumbore, tri-at-a-time against all 1024 rays.  The loop bound is
   a scalar carry, so the body has ZERO scalar syncs and pipelines at full
   VPU throughput.

Leaf triangles are tested unmasked by per-lane AABB hits: a Möller–Trumbore
hit with 0 < t < best_t is valid for *every* lane (the hit point lies inside
the leaf's AABB, so a per-ray walk would have tested that leaf for that lane
too), which is what makes the phase split sound.

Capacity: node AABBs / triangles in VMEM (~16 MB), node metadata + leaf lists
in SMEM (~0.5 MB usable).  Leaf lists are capped at LIST_CAP entries per
1024-ray packet (~25x the worst union observed at depth-8 1080p); a packet
that clamps has all its out_tri lanes set to OVERFLOW_TRI — pass
with_overflow=True to detect and re-run that wavefront on the exact XLA walk.
The wavefront falls back to the XLA walk when tables don't fit, on CPU, or
for scenes without a BVH.

Each wavefront is dispatched in CHUNK_PACKETS-sized pieces so every call
compiles the SAME pallas executable; see render.wavefront for why the kernel
must additionally stay out of shape-varying XLA programs entirely.

Same results contract as ops.traversal.traverse_bvh: closest triangle
strictly beating min_t0, (tri_index, t), -1/inf on miss.
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
CHAINS = 16                   # interleaved walks per kernel instance
CHUNK_PACKETS = 128          # packets per pallas dispatch (131072 rays)
LIST_CAP = 3072              # leaf-list entries per packet (SMEM scratch)
OVERFLOW_TRI = -2            # whole-packet marker: leaf list clamped
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
# fused walk + intersect kernel
# --------------------------------------------------------------------------


def _kernel(meta_ref, ray_ref, dir_ref, nbox_ref, tri_ref, out_t_ref,
            out_tri_ref, list_ref, *, num_nodes: int, chains: int,
            leaf_k: int):
    """`chains` interleaved packet walks, then per-packet leaf intersection.

    Two phases inside one kernel instance (an SMEM-space array crossing a
    pallas_call boundary trips a backend bug on re-execution, so the leaf
    lists live in SMEM *scratch*):

    1. Walk: slab-test nodes against whole packets, prune with the caller's
       seed bound, append each leaf hit's packed (start*16+count) to the
       chain's scratch list.  The walk has one vector->scalar `any` sync per
       visit; `chains` independent walks overlap those latencies.
    2. Intersect: per chain, a fori over its list running masked
       Möller–Trumbore tri-at-a-time against all 1024 rays.  The loop bound
       is a scalar carry — the body has zero scalar syncs and pipelines at
       full VPU throughput.

    meta_ref (SMEM, 3N i32): [3n]=skip link, [3n+1]=tri start, [3n+2]=count.
    ray_ref  (C, 7, 8, 128): fields 0-2 origin, 3-5 inverse direction,
                             6 seed bound.
    dir_ref  (C, 3, 8, 128): fields 0-2 direction.
    nbox_ref (NT, 8, 128) f32: AABB field q of node t*128+l (q: 0-2 min,
                             3-5 max).
    tri_ref  (TT, 16, 128) f32: q=0-8 -> v0.xyz v1.xyz v2.xyz.
    list_ref (SMEM scratch, (C, LIST_CAP) i32).

    A packet whose list clamps at LIST_CAP gets all its out_tri lanes set to
    OVERFLOW_TRI so the caller can detect and re-run on the exact XLA walk.
    """
    nn = jnp.int32(num_nodes)
    os_ = [[ray_ref[i, f] for f in range(3)] for i in range(chains)]
    invs = [[ray_ref[i, 3 + f] for f in range(3)] for i in range(chains)]
    bounds = [ray_ref[i, 6] for i in range(chains)]

    def cond(c):
        alive = c[0] < nn
        for i in range(1, chains):
            alive = alive | (c[i] < nn)
        return alive

    def body(c):
        poss = list(c[:chains])
        curs = list(c[chains:])
        for i in range(chains):
            pos, cur = poss[i], curs[i]
            done = pos >= nn
            node = jnp.minimum(pos, nn - 1)
            box6 = _extract_fields(nbox_ref[node // LANES],
                                   jax.lax.rem(node, LANES), 6)
            lane_hit = _slab(box6, os_[i], invs[i], bounds[i])
            any_hit = jnp.any(lane_hit) & ~done
            nxt = meta_ref[3 * node]
            start = meta_ref[3 * node + 1]
            count = meta_ref[3 * node + 2]
            is_leaf_hit = any_hit & (count > 0)
            # unconditional store: non-leaf iterations write garbage at the
            # cursor, overwritten by the next leaf hit / never read
            list_ref[i, jnp.minimum(cur, LIST_CAP - 1)] = start * 16 + count
            curs[i] = cur + jnp.where(is_leaf_hit, 1, 0)
            poss[i] = jnp.where(done, pos, jnp.where(any_hit, pos + 1, nxt))
        return tuple(poss) + tuple(curs)

    init = tuple(jnp.int32(0) for _ in range(2 * chains))
    walked = jax.lax.while_loop(cond, body, init)

    for i in range(chains):
        d = [dir_ref[i, f] for f in range(3)]
        best_t0 = ray_ref[i, 6]
        best_tri0 = jnp.full((ROWS, LANES), -1, jnp.int32)
        n_raw = walked[chains + i]
        n = jnp.minimum(n_raw, LIST_CAP)

        def mt_body(l, carry, i=i, d=d):
            best_t, best_tri = carry
            packed = list_ref[i, l]
            start = packed // 16
            count = packed - start * 16
            for k in range(leaf_k):
                best_t, best_tri = _moller_trumbore_one(
                    tri_ref, start + k, k < count, best_t, best_tri,
                    os_[i], d)
            return best_t, best_tri

        best_t, best_tri = jax.lax.fori_loop(0, n, mt_body,
                                             (best_t0, best_tri0))
        best_tri = jnp.where(n_raw > LIST_CAP, OVERFLOW_TRI, best_tri)
        out_t_ref[i] = best_t
        out_tri_ref[i] = best_tri


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
        scratch_shapes=[pltpu.SMEM((chains, LIST_CAP), jnp.int32)],
        interpret=interpret,
    )(meta, rays, dirs, nbox, tris)
    return out_t, out_tri


# --------------------------------------------------------------------------
# packing + public API
# --------------------------------------------------------------------------


def pack_scene_tables(bvh_min, bvh_max, bvh_next, bvh_tri_start,
                      bvh_tri_count, tri_v0, tri_v1, tri_v2, leaf_k: int):
    """Device-side packing into the kernel table layouts.

    Returns (nbox VMEM f32 (NT,8,128), meta SMEM i32 (3N,),
    tris VMEM f32 (TT,16,128)).
    """
    n = bvh_min.shape[0]
    t = tri_v0.shape[0]
    n_pad = _round_up(max(n, 1), LANES)
    t_pad = _round_up(t + leaf_k, LANES)

    nbox = jnp.zeros((8, n_pad), jnp.float32)
    nbox = nbox.at[0:3, :n].set(bvh_min.T)
    nbox = nbox.at[3:6, :n].set(bvh_max.T)
    nbox = nbox.reshape(8, n_pad // LANES, LANES).transpose(1, 0, 2)

    meta = jnp.zeros((3, n), jnp.int32)
    meta = meta.at[0, :].set(bvh_next)
    meta = meta.at[1, :].set(jnp.maximum(bvh_tri_start, 0))
    meta = meta.at[2, :].set(bvh_tri_count)
    meta = meta.T.reshape(3 * n)

    tris = jnp.zeros((16, t_pad), jnp.float32)
    tris = tris.at[0:3, :t].set(tri_v0.T)
    tris = tris.at[3:6, :t].set(tri_v1.T)
    tris = tris.at[6:9, :t].set(tri_v2.T)
    tris = tris.reshape(16, t_pad // LANES, LANES).transpose(1, 0, 2)
    return nbox, meta, tris


def vmem_table_bytes(num_nodes: int, num_tris: int, leaf_k: int) -> int:
    """VMEM footprint of the scene tables (node boxes + triangles — the two
    phases each load only one, but budget for the larger program)."""
    n_pad = _round_up(max(num_nodes, 1), LANES)
    t_pad = _round_up(num_tris + leaf_k, LANES)
    return 8 * n_pad * 4 + 16 * t_pad * 4


def smem_meta_bytes(num_nodes: int) -> int:
    """SMEM footprint: node metadata + per-chain leaf lists."""
    return 3 * max(num_nodes, 1) * 4 + CHAINS * (LIST_CAP + 1) * 4


def traverse_bvh_packets(origin, direction, bvh_min, bvh_max, bvh_next,
                         bvh_tri_start, bvh_tri_count, tri_v0, tri_v1, tri_v2,
                         min_t0=None, *, leaf_k: int, chains: int = CHAINS,
                         interpret: bool = False, with_overflow: bool = False):
    """Drop-in packet-kernel analog of ops.traversal.traverse_bvh.

    origin/direction (P, 3); P padded to a multiple of 1024*chains internally.
    leaf_k: static max triangles per leaf (SceneData.leaf_size; must be <= 15
    for the packed start*16+count list encoding).
    Returns (tri_index, t) with -1/inf for no triangle beating min_t0; with
    with_overflow=True returns (tri_index, t, overflowed) where `overflowed`
    is a scalar bool — True means a packet's leaf list clamped at LIST_CAP and
    the caller should re-run this wavefront on the exact XLA walk.
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
        empty = jnp.full((p,), -1, jnp.int32), jnp.full((p,), INF)
        return (*empty, jnp.asarray(False)) if with_overflow else empty

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
    overflow = jnp.any(out_tri == OVERFLOW_TRI)
    best_t = out_t.reshape(p_pad)[:p]
    best_tri = jnp.maximum(out_tri.reshape(p_pad)[:p], -1)
    best_t = jnp.where(best_tri >= 0, best_t, INF)
    if with_overflow:
        return best_tri, best_t, overflow
    return best_tri, best_t
