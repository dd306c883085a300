"""Pallas TPU packet-traversal kernel — the hot path.

Why a packet design: TPU has no fast per-lane gather, so the XLA traversal
(ops/traversal.py), which gathers each lane's own BVH node every step, runs
at HBM random-access latency (~1 element/cycle — measured ~6 ms/step for a
130k-ray wavefront).  Instead this kernel walks the skip-link BVH with ONE
shared preorder cursor per 128-ray packet:

  * node fetch = dynamic index on the *untiled* leading axis of a
    VMEM-resident (tiles, 8, 128) node table (Mosaic forbids dynamic lane
    slicing), then a one-hot lane reduction extracts the node column —
    all vector ops, no gathers;
  * the AABB slab test runs as (3, 128) row-broadcast vector ops on the VPU
    against the whole packet at once;
  * the packet descends when ANY lane hits (speculative for the others —
    identical results, only the visit set is a superset);
  * leaf triangles are stored contiguously (bvh.flatten.permute_leaf_contiguous)
    and fetched the same tile + one-hot way, then tested with broadcast
    Möller–Trumbore against the packet.

Packets are pixel tiles, so primary and low-bounce rays are coherent and the
per-packet visit union stays near the per-ray optimum.  The scene tables
(nodes + triangles) must fit VMEM (~16 MB): roughly N*64 + T*64 bytes.
The wavefront falls back to the XLA walk when they don't, on CPU, or for
scenes without a BVH.

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
INF = jnp.float32(jnp.inf)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _extract_column(tile, lane):
    """(R, 128) tile, scalar lane -> (R, 1) column via one-hot reduction."""
    rows = tile.shape[0]
    onehot = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1) == lane
    return jnp.sum(jnp.where(onehot, tile, 0), axis=1, keepdims=True)


def _kernel(ray_ref, dir_ref, nbox_ref, nmeta_ref, tri_ref, out_t_ref,
            out_tri_ref, *, num_nodes: int, leaf_k: int):
    """One grid step = one 128-ray packet.

    ray_ref  (1, 8, 128): rows 0-2 origin xyz, 3-5 inverse direction xyz,
                          row 6 seed min_t.
    dir_ref  (1, 8, 128): rows 0-2 direction xyz.
    nbox_ref (NT, 8, 128) f32: [t, q, l] = AABB field q of node t*128+l
                          (q: 0-2 min, 3-5 max).
    nmeta_ref(NT, 8, 128) i32: q=0 skip link, q=1 leaf run start,
                          q=2 leaf run count.
    tri_ref  (TT, 16, 128) f32: q=0-8 -> v0.xyz v1.xyz v2.xyz.
    """
    o = ray_ref[0, 0:3, :]
    inv_d = ray_ref[0, 3:6, :]
    d = dir_ref[0, 0:3, :]
    best_t0 = ray_ref[0, 6:7, :]
    best_tri0 = jnp.full((1, LANES), -1, jnp.int32)

    dx, dy, dz = d[0:1, :], d[1:2, :], d[2:3, :]
    ox, oy, oz = o[0:1, :], o[1:2, :], o[2:3, :]

    def cond(carry):
        pos, _, _ = carry
        return pos < num_nodes

    def body(carry):
        pos, best_t, best_tri = carry
        lane = jax.lax.rem(pos, LANES)

        box = _extract_column(nbox_ref[pos // LANES], lane)  # (8, 1) f32
        meta = _extract_column(nmeta_ref[pos // LANES], lane)  # (8, 1) i32

        t_lo = (box[0:3, :] - o) * inv_d  # (3, 128)
        t_hi = (box[3:6, :] - o) * inv_d
        near = jnp.max(jnp.minimum(t_lo, t_hi), axis=0, keepdims=True)
        far = jnp.min(jnp.maximum(t_lo, t_hi), axis=0, keepdims=True)
        lane_hit = (near <= far) & (far > 0.0) & (near <= best_t)  # (1, 128)
        any_hit = jnp.any(lane_hit)

        nxt = jnp.sum(meta[0:1, :])  # scalars for control flow
        start = jnp.sum(meta[1:2, :])
        count = jnp.sum(meta[2:3, :])

        def leaf(args):
            best_t, best_tri = args
            for k in range(leaf_k):
                ti = jnp.maximum(start, 0) + k
                col = _extract_column(tri_ref[ti // LANES], jax.lax.rem(ti, LANES))
                # triangle fields as (1,1) broadcastables — no scalar moves
                v0x, v0y, v0z = col[0:1, :], col[1:2, :], col[2:3, :]
                v1x, v1y, v1z = col[3:4, :], col[4:5, :], col[5:6, :]
                v2x, v2y, v2z = col[6:7, :], col[7:8, :], col[8:9, :]
                e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
                e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
                # p = d × e2 (per-lane vector × triangle edge)
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
                ok = (
                    det_ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                    & (t > 0.0) & (t < best_t) & lane_hit & (k < count)
                )
                best_t = jnp.where(ok, t, best_t)
                best_tri = jnp.where(ok, start + k, best_tri)
            return best_t, best_tri

        best_t, best_tri = jax.lax.cond(
            any_hit & (count > 0), leaf, lambda a: a, (best_t, best_tri)
        )
        pos = jnp.where(any_hit, pos + 1, nxt)
        return pos, best_t, best_tri

    _, best_t, best_tri = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_tri0)
    )
    out_t_ref[0, :, :] = jnp.broadcast_to(best_t, (8, LANES))
    out_tri_ref[0, :, :] = jnp.broadcast_to(best_tri, (8, LANES))


def pack_scene_tables(bvh_min, bvh_max, bvh_next, bvh_tri_start,
                      bvh_tri_count, tri_v0, tri_v1, tri_v2, leaf_k: int):
    """Device-side packing into the kernel's VMEM layouts (see _kernel doc)."""
    n = bvh_min.shape[0]
    t = tri_v0.shape[0]
    n_pad = _round_up(max(n, 1), LANES)
    t_pad = _round_up(t + leaf_k, LANES)

    nbox = jnp.zeros((8, n_pad), jnp.float32)
    nbox = nbox.at[0:3, :n].set(bvh_min.T)
    nbox = nbox.at[3:6, :n].set(bvh_max.T)
    nbox = nbox.reshape(8, n_pad // LANES, LANES).transpose(1, 0, 2)

    nmeta = jnp.zeros((8, n_pad), jnp.int32)
    nmeta = nmeta.at[0, :n].set(bvh_next)
    nmeta = nmeta.at[1, :n].set(bvh_tri_start)
    nmeta = nmeta.at[2, :n].set(bvh_tri_count)
    nmeta = nmeta.reshape(8, n_pad // LANES, LANES).transpose(1, 0, 2)

    tris = jnp.zeros((16, t_pad), jnp.float32)
    tris = tris.at[0:3, :t].set(tri_v0.T)
    tris = tris.at[3:6, :t].set(tri_v1.T)
    tris = tris.at[6:9, :t].set(tri_v2.T)
    tris = tris.reshape(16, t_pad // LANES, LANES).transpose(1, 0, 2)
    return nbox, nmeta, tris


def vmem_table_bytes(num_nodes: int, num_tris: int, leaf_k: int) -> int:
    n_pad = _round_up(max(num_nodes, 1), LANES)
    t_pad = _round_up(num_tris + leaf_k, LANES)
    return 8 * n_pad * 4 * 2 + 16 * t_pad * 4


@functools.partial(jax.jit, static_argnames=("num_nodes", "leaf_k", "interpret"))
def _run(rays, dirs, nbox, nmeta, tris, num_nodes: int, leaf_k: int,
         interpret: bool = False):
    num_tiles = rays.shape[0]
    kernel = functools.partial(_kernel, num_nodes=num_nodes, leaf_k=leaf_k)
    out_t, out_tri = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(nmeta.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(rays, dirs, nbox, nmeta, tris)
    return out_t, out_tri


def traverse_bvh_packets(origin, direction, bvh_min, bvh_max, bvh_next,
                         bvh_tri_start, bvh_tri_count, tri_v0, tri_v1, tri_v2,
                         min_t0=None, *, leaf_k: int,
                         interpret: bool = False):
    """Drop-in packet-kernel analog of ops.traversal.traverse_bvh.

    origin/direction (P, 3); P padded to a multiple of 128 internally.
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

    p_pad = _round_up(p, LANES)
    pad = p_pad - p

    o = jnp.pad(origin, ((0, pad), (0, 0))) if pad else origin
    d = jnp.where(direction == 0.0, 1e-20, direction)
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0) if pad else d
    # padded lanes seed 0 → no triangle can beat it → stay -1
    seed = jnp.pad(min_t0, ((0, pad),)) if pad else min_t0

    inv_d = 1.0 / d
    num_tiles = p_pad // LANES
    rays = jnp.concatenate(
        [o, inv_d, seed[:, None], jnp.zeros((p_pad, 1))], axis=1
    )  # (P, 8)
    rays = rays.reshape(num_tiles, LANES, 8).transpose(0, 2, 1)
    dirs = jnp.concatenate([d, jnp.zeros((p_pad, 5))], axis=1)
    dirs = dirs.reshape(num_tiles, LANES, 8).transpose(0, 2, 1)

    nbox, nmeta, tris = pack_scene_tables(
        bvh_min, bvh_max, bvh_next, bvh_tri_start, bvh_tri_count,
        tri_v0, tri_v1, tri_v2, leaf_k,
    )
    out_t, out_tri = _run(rays, dirs, nbox, nmeta, tris,
                          num_nodes=num_nodes, leaf_k=leaf_k,
                          interpret=interpret)
    best_t = out_t[:, 0, :].reshape(p_pad)[:p]
    best_tri = out_tri[:, 0, :].reshape(p_pad)[:p]
    best_t = jnp.where(best_tri >= 0, best_t, INF)
    return best_tri, best_t
