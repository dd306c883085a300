"""v2 kernel experiments: SMEM node meta, fewer scalar syncs, speculative step."""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracerwithcuda_tpu.ops.traversal_pallas import (
    LANES, _extract_column, _round_up, pack_scene_tables,
)
from kexp import pack_rays

INF = jnp.float32(jnp.inf)


def _mt8(tri_ref, start, count, mask_i, best_t, best_tri, o, d, leaf_k):
    lane_hit = mask_i > 0
    """Unrolled Moller-Trumbore over one leaf run (VMEM one-hot fetch)."""
    dx, dy, dz = d[0:1, :], d[1:2, :], d[2:3, :]
    ox, oy, oz = o[0:1, :], o[1:2, :], o[2:3, :]
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


def _slab(box, o, inv_d, best_t):
    t_lo = (box[0:3, :] - o) * inv_d
    t_hi = (box[3:6, :] - o) * inv_d
    near = jnp.max(jnp.minimum(t_lo, t_hi), axis=0, keepdims=True)
    far = jnp.min(jnp.maximum(t_lo, t_hi), axis=0, keepdims=True)
    return (near <= far) & (far > 0.0) & (near <= best_t)


# ---------------------------------------------------------------- v2: SMEM meta
def _kernel_v2(meta_ref, ray_ref, dir_ref, nbox_ref, tri_ref,
               out_t_ref, out_tri_ref, *, num_nodes, leaf_k):
    """meta_ref: SMEM int32 (3*N,) — [3n]=next, [3n+1]=start, [3n+2]=count."""
    o = ray_ref[0, 0:3, :]
    inv_d = ray_ref[0, 3:6, :]
    d = dir_ref[0, 0:3, :]
    best_t0 = ray_ref[0, 6:7, :]
    best_tri0 = jnp.full((1, LANES), -1, jnp.int32)

    def cond(c):
        return c[0] < num_nodes

    def body(c):
        pos, best_t, best_tri = c
        box = _extract_column(nbox_ref[pos // LANES], jax.lax.rem(pos, LANES))
        lane_hit = _slab(box, o, inv_d, best_t)
        any_hit = jnp.any(lane_hit)  # one vector->scalar sync
        nxt = meta_ref[3 * pos]
        start = meta_ref[3 * pos + 1]
        count = meta_ref[3 * pos + 2]

        best_t, best_tri = jax.lax.cond(
            any_hit & (count > 0),
            lambda a: _mt8(tri_ref, start, count, lane_hit.astype(jnp.int32), a[0], a[1], o, d, leaf_k),
            lambda a: a,
            (best_t, best_tri),
        )
        pos = jnp.where(any_hit, pos + 1, nxt)
        return pos, best_t, best_tri

    _, best_t, best_tri = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_tri0))
    out_t_ref[0, :, :] = jnp.broadcast_to(best_t, (8, LANES))
    out_tri_ref[0, :, :] = jnp.broadcast_to(best_tri, (8, LANES))


# ------------------------------------------------- v3: 2-level speculative step
def _kernel_v3(meta_ref, ray_ref, dir_ref, nbox_ref, tri_ref,
               out_t_ref, out_tri_ref, *, num_nodes, leaf_k):
    """Tests node a and both successors {a+1, next[a]} per iteration, one sync."""
    o = ray_ref[0, 0:3, :]
    inv_d = ray_ref[0, 3:6, :]
    d = dir_ref[0, 0:3, :]
    best_t0 = ray_ref[0, 6:7, :]
    best_tri0 = jnp.full((1, LANES), -1, jnp.int32)
    nn = jnp.int32(num_nodes)

    def cond(c):
        return c[0] < num_nodes

    def body(c):
        pos, best_t, best_tri = c
        na = meta_ref[3 * pos]
        sa = meta_ref[3 * pos + 1]
        ca = meta_ref[3 * pos + 2]
        b_hit = jnp.minimum(pos + 1, nn)   # successor if a hits (clamped)
        b_miss = na                        # successor if a misses (may be nn)
        bh = jnp.minimum(b_hit, nn - 1)    # safe fetch indices
        bm = jnp.minimum(b_miss, nn - 1)

        box_a = _extract_column(nbox_ref[pos // LANES], jax.lax.rem(pos, LANES))
        box_h = _extract_column(nbox_ref[bh // LANES], jax.lax.rem(bh, LANES))
        box_m = _extract_column(nbox_ref[bm // LANES], jax.lax.rem(bm, LANES))
        hit_a = _slab(box_a, o, inv_d, best_t)
        hit_h = _slab(box_h, o, inv_d, best_t)
        hit_m = _slab(box_m, o, inv_d, best_t)
        # one packed vector->scalar sync: OR the 3 bits across lanes via max of
        # the packed per-lane value (max == bitwise-or here is NOT true in
        # general, so reduce each bit by max separately packed in one vector)
        packed_vec = (jnp.where(hit_a, 1, 0) + jnp.where(hit_h, 2, 0)
                      + jnp.where(hit_m, 4, 0))
        bits = (jnp.max(jnp.where(hit_a, 1, 0)) + 2 * jnp.max(jnp.where(hit_h, 1, 0))
                + 4 * jnp.max(jnp.where(hit_m, 1, 0)))
        del packed_vec
        any_a = (bits & 1) > 0
        any_h = (bits & 2) > 0
        any_m = (bits & 4) > 0

        best_t, best_tri = jax.lax.cond(
            any_a & (ca > 0),
            lambda a: _mt8(tri_ref, sa, ca, hit_a.astype(jnp.int32), a[0], a[1], o, d, leaf_k),
            lambda a: a,
            (best_t, best_tri),
        )
        b = jnp.where(any_a, b_hit, b_miss)
        hit_b_any = jnp.where(any_a, any_h, any_m)
        valid_b = b < nn
        sb = meta_ref[3 * jnp.minimum(b, nn - 1) + 1]
        cb = meta_ref[3 * jnp.minimum(b, nn - 1) + 2]
        nb = meta_ref[3 * jnp.minimum(b, nn - 1)]

        hit_b_i = jnp.where(any_a, hit_h.astype(jnp.int32), hit_m.astype(jnp.int32))
        best_t, best_tri = jax.lax.cond(
            valid_b & hit_b_any & (cb > 0),
            lambda a: _mt8(tri_ref, sb, cb, hit_b_i, a[0], a[1], o, d, leaf_k),
            lambda a: a,
            (best_t, best_tri),
        )
        pos = jnp.where(valid_b, jnp.where(hit_b_any, b + 1, nb), nn)
        return pos, best_t, best_tri

    _, best_t, best_tri = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_tri0))
    out_t_ref[0, :, :] = jnp.broadcast_to(best_t, (8, LANES))
    out_tri_ref[0, :, :] = jnp.broadcast_to(best_tri, (8, LANES))


def make_run(kernel_fn, nbox, tris, meta, num_nodes, leaf_k):
    @jax.jit
    def run(rays, dirs):
        num_tiles = rays.shape[0]
        kernel = functools.partial(kernel_fn, num_nodes=num_nodes, leaf_k=leaf_k)
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(tris.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_tiles, 8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((num_tiles, 8, LANES), jnp.int32),
            ],
        )(meta, rays, dirs, nbox, tris)
    return run


def main():
    from pathtracerwithcuda_tpu.scene.examples import (
        flagship_scene, flagship_config, flagship_camera)
    from pathtracerwithcuda_tpu.scene.build import build_scene_data
    from pathtracerwithcuda_tpu.render import wavefront
    from pathtracerwithcuda_tpu.ops import rng as rng_mod
    from pathtracerwithcuda_tpu.ops.traversal_pallas import traverse_bvh_packets

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

    nbox, nmeta_t, tris = pack_scene_tables(
        sc.bvh_min, sc.bvh_max, sc.bvh_next, sc.bvh_tri_start,
        sc.bvh_tri_count, sc.tri_v0, sc.tri_v1, sc.tri_v2, sc.leaf_size)
    nn = sc.num_bvh_nodes
    meta = np.zeros((3 * nn,), np.int32)
    meta[0::3] = np.asarray(sc.bvh_next)
    meta[1::3] = np.asarray(sc.bvh_tri_start)
    meta[2::3] = np.asarray(sc.bvh_tri_count)
    meta = jnp.asarray(meta)

    # reference results from current kernel
    args = (sc.bvh_min, sc.bvh_max, sc.bvh_next, sc.bvh_tri_start,
            sc.bvh_tri_count, sc.tri_v0, sc.tri_v1, sc.tri_v2)
    ref_tri, ref_t = traverse_bvh_packets(
        state0.origin, state0.direction, *args, leaf_k=sc.leaf_size)
    ref_tri = np.asarray(ref_tri)

    # bounce1 sorted rays
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
    perm = np.argsort((oct_ << 30) | mort, kind="stable")
    b1_o = jnp.asarray(o_np[perm])
    b1_d = jnp.asarray(d_np[perm])

    for name, kfn in [("v2 smem-meta", _kernel_v2), ("v3 speculative", _kernel_v3)]:
        run = make_run(kfn, nbox, tris, meta, nn, sc.leaf_size)
        rays, dirs = pack_rays(state0.origin, state0.direction)
        out = run(rays, dirs); jax.block_until_ready(out)
        got_tri = np.asarray(out[1][:, 0, :]).reshape(-1)[:state0.origin.shape[0]]
        match = (got_tri == ref_tri).mean()
        t0 = time.time(); out = run(rays, dirs); jax.block_until_ready(out)
        dt = time.time() - t0
        n = state0.origin.shape[0]
        print(f"{name:16s} primary: {dt:6.3f}s {n/dt/1e6:7.2f} Mray/s  match={match:.6f}")
        rays, dirs = pack_rays(b1_o, b1_d)
        out = run(rays, dirs); jax.block_until_ready(out)
        t0 = time.time(); out = run(rays, dirs); jax.block_until_ready(out)
        dt = time.time() - t0
        n = b1_o.shape[0]
        print(f"{name:16s} bounce1: {dt:6.3f}s {n/dt/1e6:7.2f} Mray/s")


if __name__ == "__main__":
    main()
