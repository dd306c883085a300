"""Pallas TPU packet-traversal kernel — the hot path.

Why a packet design: TPU has no fast per-lane gather, so the XLA traversal
(ops/traversal.py), which gathers each lane's own BVH node every step, runs
at HBM random-access latency.  Instead this kernel walks the skip-link BVH
(reference layout: Bvh/bvh.cpp:244-330, walk Kernel/path_tracer_kernel.cu:85-161)
with ONE shared preorder cursor per packet of rays, testing the node's AABB
against the whole packet with broadcast vector ops and descending when ANY
lane hits.  Three measured-on-v5e design rules shape the kernel:

1. **Full-height vectors.**  A (1, 128) op costs the same cycle as an
   (8, 128) op, so a packet is 8x128 = 1024 rays laid out as one register
   row-block per ray field; every slab/Möller–Trumbore op then runs at full
   VPU width.  Packets are 32x32 pixel tiles (render.wavefront render_order),
   so primary packets stay coherent; bounced rays should be compacted +
   sorted by the caller.

2. **Latency hiding via interleaved chains.**  A single walk serializes on
   one vector→scalar `any(hit)` round trip per node (~240 ns on v5e — the
   full VPU pipeline + scalar-unit sync).  The kernel interleaves CHAINS
   independent packet walks per kernel instance; their dependency chains
   overlap and the per-visit latency drops to ~40 ns.

3. **Scalar data from SMEM, no branches in the steady state.**  Node
   metadata (skip link, leaf start/count) lives in SMEM and is read with
   plain scalar loads.  Node AABBs live in a VMEM (tiles, 8, 128) table; a
   fetch is a dynamic index on the untiled leading axis plus a one-hot lane
   reduction (Mosaic forbids dynamic lane slicing) — all vector ops.

Leaf triangles are stored contiguously and tested unmasked: a Möller–Trumbore
hit with 0 < t < best_t is valid for *every* lane (the hit point lies inside
the leaf's AABB, so a per-ray walk would have tested it too), which removes
any need to thread the packet's per-lane AABB mask into the leaf test.

The scene tables must fit on chip: node AABBs + triangles in VMEM (~16 MB),
node metadata in SMEM (~0.5 MB usable).  The wavefront falls back to the XLA
walk when they don't, on CPU, or for scenes without a BVH.

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
CHAINS = 8                   # independent packet walks interleaved per instance
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
    """box6: six (1,1) fields; o/inv_d: three (8,128) each; -> (8,128) mask."""
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

    Unmasked by per-lane AABB hits: any hit with 0 < t < best_t is globally
    valid (see module doc).  Pure vector ops — no branches, no scalar syncs.
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


def _kernel(meta_ref, ray_ref, dir_ref, nbox_ref, tri_ref, out_t_ref,
            out_tri_ref, *, num_nodes: int, num_tris: int, chains: int):
    """One grid step = `chains` interleaved 1024-ray packet walks.

    meta_ref (SMEM, 3N int32): [3n]=skip link, [3n+1]=leaf start, [3n+2]=count.
    ray_ref  (C, 7, 8, 128): fields 0-2 origin xyz, 3-5 inverse direction xyz,
                             field 6 seed min_t.
    dir_ref  (C, 3, 8, 128): fields 0-2 direction xyz.
    nbox_ref (NT, 8, 128) f32: [t, q, l] = AABB field q of node t*128+l
                             (q: 0-2 min, 3-5 max).
    tri_ref  (TT, 16, 128) f32: q=0-8 -> v0.xyz v1.xyz v2.xyz.
    """
    nn = jnp.int32(num_nodes)
    os_ = [[ray_ref[i, f] for f in range(3)] for i in range(chains)]
    invs = [[ray_ref[i, 3 + f] for f in range(3)] for i in range(chains)]
    ds_ = [[dir_ref[i, f] for f in range(3)] for i in range(chains)]

    # per-chain carry: pos, tri-queue cursor, tris left in queue,
    #                  best_t (8,128), best_tri (8,128)
    P, QC, QL, BT, BTRI = range(5)

    def sl(c, field):
        return list(c[field * chains:(field + 1) * chains])

    def cond(c):
        alive = (c[P * chains] < nn) | (c[QL * chains] > 0)
        for i in range(1, chains):
            alive = alive | (c[P * chains + i] < nn) | (c[QL * chains + i] > 0)
        return alive

    def body(c):
        poss, qcs, qls = sl(c, P), sl(c, QC), sl(c, QL)
        bts, btris = sl(c, BT), sl(c, BTRI)
        for i in range(chains):
            pos, qc, ql = poss[i], qcs[i], qls[i]
            busy = ql > 0            # draining a leaf's triangle run
            done = pos >= nn

            # --- walk slot: slab-test the current node (wasted while busy)
            node = jnp.minimum(pos, nn - 1)
            box6 = _extract_fields(nbox_ref[node // LANES],
                                   jax.lax.rem(node, LANES), 6)
            lane_hit = _slab(box6, os_[i], invs[i], bts[i])
            any_hit = jnp.any(lane_hit) & ~done & ~busy
            nxt = meta_ref[3 * node]
            start = meta_ref[3 * node + 1]
            count = meta_ref[3 * node + 2]

            # --- MT slot: test the queue-head triangle (wasted while idle)
            ti = jnp.minimum(qc, jnp.int32(max(num_tris - 1, 0)))
            bts[i], btris[i] = _moller_trumbore_one(
                tri_ref, jnp.maximum(ti, 0), busy, bts[i], btris[i],
                os_[i], ds_[i])

            # --- state updates (all selects, no branches)
            enq = any_hit & (count > 0)
            qcs[i] = jnp.where(enq, start, jnp.where(busy, qc + 1, qc))
            qls[i] = jnp.where(enq, count, jnp.where(busy, ql - 1, ql))
            poss[i] = jnp.where(done | busy, pos,
                                jnp.where(any_hit, pos + 1, nxt))
        return tuple(poss) + tuple(qcs) + tuple(qls) + tuple(bts) + tuple(btris)

    init = (
        tuple(jnp.int32(0) for _ in range(chains))          # pos
        + tuple(jnp.int32(0) for _ in range(chains))        # queue cursor
        + tuple(jnp.int32(0) for _ in range(chains))        # queue length
        + tuple(ray_ref[i, 6] for i in range(chains))       # best_t seed
        + tuple(jnp.full((ROWS, LANES), -1, jnp.int32) for _ in range(chains))
    )
    out = jax.lax.while_loop(cond, body, init)
    for i in range(chains):
        out_t_ref[i] = out[BT * chains + i]
        out_tri_ref[i] = out[BTRI * chains + i]


def pack_scene_tables(bvh_min, bvh_max, bvh_next, bvh_tri_start,
                      bvh_tri_count, tri_v0, tri_v1, tri_v2, leaf_k: int):
    """Device-side packing into the kernel's table layouts (see _kernel doc).

    Returns (nbox VMEM f32, meta SMEM i32 flat, tris VMEM f32).
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
    meta = meta.at[1, :].set(bvh_tri_start)
    meta = meta.at[2, :].set(bvh_tri_count)
    meta = meta.T.reshape(3 * n)

    tris = jnp.zeros((16, t_pad), jnp.float32)
    tris = tris.at[0:3, :t].set(tri_v0.T)
    tris = tris.at[3:6, :t].set(tri_v1.T)
    tris = tris.at[6:9, :t].set(tri_v2.T)
    tris = tris.reshape(16, t_pad // LANES, LANES).transpose(1, 0, 2)
    return nbox, meta, tris


def vmem_table_bytes(num_nodes: int, num_tris: int, leaf_k: int) -> int:
    """VMEM footprint of the scene tables (node boxes + triangles)."""
    n_pad = _round_up(max(num_nodes, 1), LANES)
    t_pad = _round_up(num_tris + leaf_k, LANES)
    return 8 * n_pad * 4 + 16 * t_pad * 4


def smem_meta_bytes(num_nodes: int) -> int:
    """SMEM footprint of the node metadata table."""
    return 3 * max(num_nodes, 1) * 4


@functools.partial(jax.jit, static_argnames=("num_nodes", "num_tris",
                                             "chains", "interpret"))
def _run(rays, dirs, nbox, meta, tris, num_nodes: int, num_tris: int,
         chains: int, interpret: bool = False):
    num_packets = rays.shape[0]
    grid = num_packets // chains
    kernel = functools.partial(_kernel, num_nodes=num_nodes,
                               num_tris=num_tris, chains=chains)
    out_t, out_tri = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chains, 7, ROWS, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chains, 3, ROWS, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(meta, rays, dirs, nbox, tris)
    return out_t, out_tri


def traverse_bvh_packets(origin, direction, bvh_min, bvh_max, bvh_next,
                         bvh_tri_start, bvh_tri_count, tri_v0, tri_v1, tri_v2,
                         min_t0=None, *, leaf_k: int, chains: int = CHAINS,
                         interpret: bool = False):
    """Drop-in packet-kernel analog of ops.traversal.traverse_bvh.

    origin/direction (P, 3); P padded to a multiple of 1024*chains internally.
    leaf_k: static max triangles per leaf (SceneData.leaf_size).
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

    p_pad = _round_up(p, PACKET * chains)
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
    out_t, out_tri = _run(rays, dirs, nbox, meta, tris,
                          num_nodes=num_nodes, num_tris=tri_v0.shape[0],
                          chains=chains, interpret=interpret)
    best_t = out_t.reshape(p_pad)[:p]
    best_tri = out_tri.reshape(p_pad)[:p]
    best_t = jnp.where(best_tri >= 0, best_t, INF)
    return best_tri, best_t
