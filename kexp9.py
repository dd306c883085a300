"""Anatomy of the real kernel: pure walk vs leaf-cond vs MT cost."""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pathtracerwithcuda_tpu.ops.traversal_pallas import (
    LANES, ROWS, PACKET, _extract_fields, _slab, _moller_trumbore_leaf,
    _round_up, pack_scene_tables, FAR_ORIGIN)

def mk_kernel(num_nodes, leaf_k, chains, mode):
    def kernel(meta_ref, ray_ref, dir_ref, nbox_ref, tri_ref, out_t_ref, out_tri_ref):
        nn = jnp.int32(num_nodes)
        os_ = [[ray_ref[i, f] for f in range(3)] for i in range(chains)]
        invs = [[ray_ref[i, 3 + f] for f in range(3)] for i in range(chains)]
        ds_ = [[dir_ref[i, f] for f in range(3)] for i in range(chains)]
        def cond(c):
            alive = c[0] < nn
            for i in range(1, chains):
                alive = alive | (c[i] < nn)
            return alive
        def body(c):
            poss = list(c[:chains])
            bts = list(c[chains:2*chains])
            btris = list(c[2*chains:3*chains])
            for i in range(chains):
                pos = poss[i]
                done = pos >= nn
                node = jnp.minimum(pos, nn - 1)
                box6 = _extract_fields(nbox_ref[node // LANES], jax.lax.rem(node, LANES), 6)
                lane_hit = _slab(box6, os_[i], invs[i], bts[i])
                any_hit = jnp.any(lane_hit) & ~done
                nxt = meta_ref[3 * node]
                start = meta_ref[3 * node + 1]
                count = meta_ref[3 * node + 2]
                if mode == "full":
                    bts[i], btris[i] = jax.lax.cond(
                        any_hit & (count > 0),
                        lambda a, i=i, start=start, count=count:
                            _moller_trumbore_leaf(tri_ref, start, count, a[0], a[1],
                                                  os_[i], ds_[i], leaf_k),
                        lambda a: a, (bts[i], btris[i]))
                elif mode == "emptycond":
                    bts[i], btris[i] = jax.lax.cond(
                        any_hit & (count > 0),
                        lambda a: (a[0] * 0.9999999, a[1]),
                        lambda a: a, (bts[i], btris[i]))
                elif mode == "onetri":
                    bts[i], btris[i] = jax.lax.cond(
                        any_hit & (count > 0),
                        lambda a, i=i, start=start, count=count:
                            _moller_trumbore_leaf(tri_ref, start, count, a[0], a[1],
                                                  os_[i], ds_[i], 1),
                        lambda a: a, (bts[i], btris[i]))
                # "walk": no leaf work at all
                poss[i] = jnp.where(done, pos, jnp.where(any_hit, pos + 1, nxt))
            return tuple(poss) + tuple(bts) + tuple(btris)
        init = (tuple(jnp.int32(0) for _ in range(chains))
                + tuple(ray_ref[i, 6] for i in range(chains))
                + tuple(jnp.full((ROWS, LANES), -1, jnp.int32) for _ in range(chains)))
        out = jax.lax.while_loop(cond, body, init)
        for i in range(chains):
            out_t_ref[i] = out[chains + i]
            out_tri_ref[i] = out[2 * chains + i]
    return kernel

def run_mode(mode, chains, states, sc):
    origin, direction = states[0]
    p = origin.shape[0]
    p_pad = _round_up(p, PACKET * chains)
    pad = p_pad - p
    o = jnp.pad(origin, ((0, pad), (0, 0)), constant_values=FAR_ORIGIN) if pad else origin
    d = jnp.where(direction == 0.0, 1e-20, direction)
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0) if pad else d
    seed = jnp.full((p_pad,), jnp.inf, jnp.float32)
    inv_d = 1.0 / d
    num_packets = p_pad // PACKET
    rays = jnp.concatenate([o, inv_d, seed[:, None]], axis=1)
    rays = rays.reshape(num_packets, ROWS, LANES, 7).transpose(0, 3, 1, 2)
    dirs = d.reshape(num_packets, ROWS, LANES, 3).transpose(0, 3, 1, 2)
    nbox, meta, tris = pack_scene_tables(
        sc.bvh_min, sc.bvh_max, sc.bvh_next, sc.bvh_tri_start, sc.bvh_tri_count,
        sc.tri_v0, sc.tri_v1, sc.tri_v2, sc.leaf_size)
    kernel = mk_kernel(sc.num_bvh_nodes, sc.leaf_size, chains, mode)
    @jax.jit
    def go(rays, dirs, nbox, meta, tris):
        return pl.pallas_call(
            kernel, grid=(num_packets // chains,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((chains, 7, ROWS, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chains, 3, ROWS, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(tris.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((chains, ROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chains, ROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_packets, ROWS, LANES), jnp.float32),
                jax.ShapeDtypeStruct((num_packets, ROWS, LANES), jnp.int32),
            ])(meta, rays, dirs, nbox, tris)
    def pack(o_, d_):
        o2 = jnp.pad(o_, ((0, pad), (0, 0)), constant_values=FAR_ORIGIN) if pad else o_
        d2 = jnp.where(d_ == 0.0, 1e-20, d_)
        d2 = jnp.pad(d2, ((0, pad), (0, 0)), constant_values=1.0) if pad else d2
        r_ = jnp.concatenate([o2, 1.0 / d2, seed[:, None]], axis=1)
        r_ = r_.reshape(num_packets, ROWS, LANES, 7).transpose(0, 3, 1, 2)
        dd = d2.reshape(num_packets, ROWS, LANES, 3).transpose(0, 3, 1, 2)
        return jax.block_until_ready(r_), jax.block_until_ready(dd)

    out = go(rays, dirs, nbox, meta, tris)
    _ = np.asarray(out[1][0, 0, 0])  # readback: actually drain the warmup
    packed = [pack(o_, d_) for (o_, d_) in states[1:]]
    for rb, db in packed:
        _ = np.asarray(rb[0, 0, 0, 0])
    t0 = time.time()
    for rb, db in packed:
        out = go(rb, db, nbox, meta, tris)
    _ = np.asarray(out[1][0, 0, 0])  # force real completion via data readback
    avg = (time.time() - t0) / len(packed)
    print(f"mode={mode:10s} chains={chains}  {avg:7.3f}s -> {p/avg/1e6:7.2f} Mray/s")

def main():
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
    states = []
    for r in range(4):
        key = rng_mod.pass_key(jax.random.PRNGKey(0), r)
        s = wavefront._raygen_jit(cam, cfg, key, pixel_ids)
        jax.block_until_ready(s.origin)
        states.append((s.origin, s.direction))
    for mode in ["walk", "emptycond", "onetri", "full"]:
        run_mode(mode, 8, states, sc)
    run_mode("walk", 1, states, sc)
    run_mode("full", 1, states, sc)

if __name__ == "__main__":
    main()
