"""Walk-kernel ablation: per-iteration SMEM store vs list copy-out cost."""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pathtracerwithcuda_tpu.ops import traversal_pallas as tp
from pathtracerwithcuda_tpu.ops.traversal_pallas import (
    LANES, ROWS, PACKET, _extract_fields, _slab, _round_up, FAR_ORIGIN,
    pack_scene_tables)

def mk_walk(num_nodes, chains, cap, store_mode):
    def kernel(meta_ref, ray_ref, nbox_ref, list_ref, count_ref):
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
            poss = list(c[:chains]); curs = list(c[chains:])
            for i in range(chains):
                pos, cur = poss[i], curs[i]
                done = pos >= nn
                node = jnp.minimum(pos, nn - 1)
                box6 = _extract_fields(nbox_ref[node // LANES], jax.lax.rem(node, LANES), 6)
                lane_hit = _slab(box6, os_[i], invs[i], bounds[i])
                any_hit = jnp.any(lane_hit) & ~done
                nxt = meta_ref[3 * node]
                start = meta_ref[3 * node + 1]
                count = meta_ref[3 * node + 2]
                is_leaf_hit = any_hit & (count > 0)
                if store_mode == "cursor":
                    list_ref[i, jnp.minimum(cur, cap - 1)] = start * 16 + count
                elif store_mode == "fixed":
                    list_ref[i, 0] = start * 16 + count
                # "none": no store
                curs[i] = cur + jnp.where(is_leaf_hit, 1, 0)
                poss[i] = jnp.where(done, pos, jnp.where(any_hit, pos + 1, nxt))
            return tuple(poss) + tuple(curs)
        out = jax.lax.while_loop(cond, body, tuple(jnp.int32(0) for _ in range(2*chains)))
        for i in range(chains):
            count_ref[i, 0] = out[chains + i]
    return kernel

def bench(name, sc, rays_sets, cap, store_mode, chains=8):
    nbox, meta, _ = pack_scene_tables(sc.bvh_min, sc.bvh_max, sc.bvh_next,
        sc.bvh_tri_start, sc.bvh_tri_count, sc.tri_v0, sc.tri_v1, sc.tri_v2, sc.leaf_size)
    num_packets = rays_sets[0].shape[0]
    kernel = mk_walk(sc.num_bvh_nodes, chains, cap, store_mode)
    @jax.jit
    def go(rays, nbox, meta):
        return pl.pallas_call(
            kernel, grid=(num_packets // chains,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((chains, 7, ROWS, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((chains, cap), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((chains, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_packets, cap), jnp.int32),
                jax.ShapeDtypeStruct((num_packets, 1), jnp.int32),
            ])(meta, rays, nbox)
    out = go(rays_sets[0], nbox, meta); np.asarray(out[1][0,0])
    t0 = time.time()
    for r in rays_sets[1:]:
        out = go(r, nbox, meta)
    np.asarray(out[1][0,0])
    dt = (time.time()-t0)/(len(rays_sets)-1)
    print(f"{name:28s} {dt:7.4f}s -> {2073600/dt/1e6:6.1f} Mray/s")

def main():
    from pathtracerwithcuda_tpu.scene.examples import (flagship_scene, flagship_config, flagship_camera)
    from pathtracerwithcuda_tpu.scene.build import build_scene_data
    from pathtracerwithcuda_tpu.render import wavefront
    from pathtracerwithcuda_tpu.ops import rng as rng_mod
    cfg = flagship_config(width=1920, height=1080, max_tracer_depth=8, spp_per_pass=4, loop_mode='host')
    sc = build_scene_data(flagship_scene(), cfg)
    cam = flagship_camera(1920, 1080)
    order, _ = wavefront.render_order(1920, 1080)
    pixel_ids = jnp.asarray(order)
    def prep(s):
        p = s.origin.shape[0]
        p_pad = _round_up(p, PACKET * 8); pad = p_pad - p
        o = jnp.pad(s.origin, ((0,pad),(0,0)), constant_values=FAR_ORIGIN) if pad else s.origin
        d = jnp.where(s.direction==0.0, 1e-20, s.direction)
        d = jnp.pad(d, ((0,pad),(0,0)), constant_values=1.0) if pad else d
        seed = jnp.full((p_pad,), jnp.inf, jnp.float32)
        rays = jnp.concatenate([o, 1.0/d, seed[:,None]], axis=1)
        rays = rays.reshape(p_pad//PACKET, ROWS, LANES, 7).transpose(0,3,1,2)
        return jax.block_until_ready(rays)
    sets = []
    for r in range(4):
        key = rng_mod.pass_key(jax.random.PRNGKey(0), r)
        s = wavefront._raygen_jit(cam, cfg, key, pixel_ids)
        sets.append(prep(s))
    bench("primary store=cursor cap3072", sc, sets, 3072, "cursor")
    bench("primary store=fixed  cap3072", sc, sets, 3072, "fixed")
    bench("primary store=none   cap3072", sc, sets, 3072, "none")
    bench("primary store=cursor cap512", sc, sets, 512, "cursor")

main()
