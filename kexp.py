"""Kernel experiments: iteration counts + cost split for the packet kernel."""
import functools, time, sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracerwithcuda_tpu.ops.traversal_pallas import (
    LANES, _extract_column, _round_up, pack_scene_tables,
)

INF = jnp.float32(jnp.inf)


def _kernel(ray_ref, dir_ref, nbox_ref, nmeta_ref, tri_ref, out_t_ref,
            out_tri_ref, out_it_ref, *, num_nodes, leaf_k, do_leaf):
    o = ray_ref[0, 0:3, :]
    inv_d = ray_ref[0, 3:6, :]
    d = dir_ref[0, 0:3, :]
    best_t0 = ray_ref[0, 6:7, :]
    best_tri0 = jnp.full((1, LANES), -1, jnp.int32)
    dx, dy, dz = d[0:1, :], d[1:2, :], d[2:3, :]
    ox, oy, oz = o[0:1, :], o[1:2, :], o[2:3, :]

    def cond(c):
        return c[0] < num_nodes

    def body(c):
        pos, best_t, best_tri, iters, leafs = c
        lane = jax.lax.rem(pos, LANES)
        box = _extract_column(nbox_ref[pos // LANES], lane)
        meta = _extract_column(nmeta_ref[pos // LANES], lane)
        t_lo = (box[0:3, :] - o) * inv_d
        t_hi = (box[3:6, :] - o) * inv_d
        near = jnp.max(jnp.minimum(t_lo, t_hi), axis=0, keepdims=True)
        far = jnp.min(jnp.maximum(t_lo, t_hi), axis=0, keepdims=True)
        lane_hit = (near <= far) & (far > 0.0) & (near <= best_t)
        any_hit = jnp.any(lane_hit)
        nxt = jnp.sum(meta[0:1, :])
        start = jnp.sum(meta[1:2, :])
        count = jnp.sum(meta[2:3, :])
        is_leaf_visit = any_hit & (count > 0)

        def leaf(args):
            best_t, best_tri = args
            for k in range(leaf_k):
                ti = jnp.maximum(start, 0) + k
                col = _extract_column(tri_ref[ti // LANES], jax.lax.rem(ti, LANES))
                v0x, v0y, v0z = col[0:1, :], col[1:2, :], col[2:3, :]
                v1x, v1y, v1z = col[3:4, :], col[4:5, :], col[5:6, :]
                v2x, v2y, v2z = col[6:7, :], col[7:8, :], col[8:9, :]
                e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
                e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                det_ok = det != 0.0
                inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                b1 = (tx * px + ty * py + tz * pz) * inv_det
                b2 = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (det_ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                      & (t > 0.0) & (t < best_t) & lane_hit & (k < count))
                best_t = jnp.where(ok, t, best_t)
                best_tri = jnp.where(ok, start + k, best_tri)
            return best_t, best_tri

        if do_leaf:
            best_t, best_tri = jax.lax.cond(
                is_leaf_visit, leaf, lambda a: a, (best_t, best_tri))
        pos = jnp.where(any_hit, pos + 1, nxt)
        return (pos, best_t, best_tri, iters + 1,
                leafs + jnp.where(is_leaf_visit, 1, 0))

    _, best_t, best_tri, iters, leafs = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_tri0, jnp.int32(0), jnp.int32(0)))
    out_t_ref[0, :, :] = jnp.broadcast_to(best_t, (8, LANES))
    out_tri_ref[0, :, :] = jnp.broadcast_to(best_tri, (8, LANES))
    out_it_ref[0, 0, :] = jnp.broadcast_to(iters, (LANES,))
    out_it_ref[0, 1, :] = jnp.broadcast_to(leafs, (LANES,))


@functools.partial(jax.jit, static_argnames=("num_nodes", "leaf_k", "do_leaf"))
def run(rays, dirs, nbox, nmeta, tris, num_nodes, leaf_k, do_leaf):
    num_tiles = rays.shape[0]
    kernel = functools.partial(_kernel, num_nodes=num_nodes, leaf_k=leaf_k,
                               do_leaf=do_leaf)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(nmeta.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, LANES), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, 8, LANES), jnp.int32),
        ],
    )(rays, dirs, nbox, nmeta, tris)


def pack_rays(origin, direction, min_t0=None):
    import numpy as np
    p = origin.shape[0]
    p_pad = _round_up(p, LANES)
    pad = p_pad - p
    o = jnp.pad(origin, ((0, pad), (0, 0))) if pad else origin
    d = jnp.where(direction == 0.0, 1e-20, direction)
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0) if pad else d
    seed = jnp.full((p,), INF) if min_t0 is None else min_t0
    seed = jnp.pad(seed, ((0, pad),)) if pad else seed
    inv_d = 1.0 / d
    num_tiles = p_pad // LANES
    rays = jnp.concatenate([o, inv_d, seed[:, None], jnp.zeros((p_pad, 1))], axis=1)
    rays = rays.reshape(num_tiles, LANES, 8).transpose(0, 2, 1)
    dirs = jnp.concatenate([d, jnp.zeros((p_pad, 5))], axis=1)
    dirs = dirs.reshape(num_tiles, LANES, 8).transpose(0, 2, 1)
    return rays, dirs


def main():
    import numpy as np
    from pathtracerwithcuda_tpu.scene.examples import (
        flagship_scene, flagship_config, flagship_camera)
    from pathtracerwithcuda_tpu.scene.build import build_scene_data
    from pathtracerwithcuda_tpu.render import wavefront
    from pathtracerwithcuda_tpu.ops import rng as rng_mod

    cfg = flagship_config(width=1920, height=1080, max_tracer_depth=8,
                          spp_per_pass=4, loop_mode='host')
    sc = build_scene_data(flagship_scene(), cfg)
    cam = flagship_camera(1920, 1080)
    order, _ = wavefront.render_order(1920, 1080)
    pixel_ids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(0), 0)
    state0 = wavefront._raygen_jit(cam, cfg, key, pixel_ids)
    s1, _ = wavefront._bounce_jit(state0, sc, cfg, key, 0, pixel_ids)
    jax.block_until_ready(s1.origin)

    nbox, nmeta, tris = pack_scene_tables(
        sc.bvh_min, sc.bvh_max, sc.bvh_next, sc.bvh_tri_start,
        sc.bvh_tri_count, sc.tri_v0, sc.tri_v1, sc.tri_v2, sc.leaf_size)
    nbox, nmeta, tris = map(jax.block_until_ready, (nbox, nmeta, tris))
    nn = sc.num_bvh_nodes

    def bench(name, origin, direction, do_leaf):
        rays, dirs = pack_rays(origin, direction)
        out = run(rays, dirs, nbox, nmeta, tris, nn, sc.leaf_size, do_leaf)
        jax.block_until_ready(out)
        t0 = time.time()
        out = run(rays, dirs, nbox, nmeta, tris, nn, sc.leaf_size, do_leaf)
        jax.block_until_ready(out)
        dt = time.time() - t0
        iters = np.asarray(out[2][:, 0, 0])
        leafs = np.asarray(out[2][:, 1, 0])
        n = origin.shape[0]
        print(f"{name:36s} do_leaf={do_leaf!s:5s} {dt:7.3f}s "
              f"{n/dt/1e6:7.2f} Mray/s  iters/pkt avg={iters.mean():7.1f} "
              f"p95={np.percentile(iters,95):7.1f} leafs/pkt={leafs.mean():6.1f} "
              f"ns/iter={dt/iters.sum()*1e9:6.1f}")

    bench("primary (coherent tiles)", state0.origin, state0.direction, True)
    bench("primary (coherent tiles)", state0.origin, state0.direction, False)

    # compact+sort bounce-1 rays
    act = np.asarray(s1.active)
    idx = np.nonzero(act)[0]
    o_np = np.asarray(s1.origin)[idx]
    d_np = np.asarray(s1.direction)[idx]
    oct_ = (((d_np[:, 0] > 0).astype(np.int64) << 2)
            | ((d_np[:, 1] > 0).astype(np.int64) << 1)
            | (d_np[:, 2] > 0).astype(np.int64))
    lo, hi = o_np.min(0), o_np.max(0)
    q = ((o_np - lo) / np.maximum(hi - lo, 1e-9) * 1023).astype(np.int64)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    mort = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    keys = (oct_ << 30) | mort
    perm = np.argsort(keys, kind="stable")
    bench("bounce1 compact+sort(oct,pos)",
          jnp.asarray(o_np[perm]), jnp.asarray(d_np[perm]), True)
    bench("bounce1 compact+sort(oct,pos)",
          jnp.asarray(o_np[perm]), jnp.asarray(d_np[perm]), False)
    # finer: 6D morton (pos 5b + dir 5b interleave)
    dq = ((d_np + 1) / 2 * 31).astype(np.int64)
    pq = ((o_np - lo) / np.maximum(hi - lo, 1e-9) * 31).astype(np.int64)

    def spread6(x):  # 5 bits -> every 6th
        out = np.zeros_like(x)
        for b in range(5):
            out |= ((x >> b) & 1) << (6 * b)
        return out
    k6 = (spread6(pq[:, 0]) | (spread6(pq[:, 1]) << 1) | (spread6(pq[:, 2]) << 2)
          | (spread6(dq[:, 0]) << 3) | (spread6(dq[:, 1]) << 4) | (spread6(dq[:, 2]) << 5))
    perm6 = np.argsort(k6, kind="stable")
    bench("bounce1 compact+sort(6D morton)",
          jnp.asarray(o_np[perm6]), jnp.asarray(d_np[perm6]), True)


if __name__ == "__main__":
    main()
