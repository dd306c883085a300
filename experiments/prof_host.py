"""Per-stage timing of the production host loop (flagship 1080p).

Reproduces trace_radiance_host stage-by-stage with a block_until_ready fence
after every dispatch, attributing pass time to raygen / pad / traverse /
shade / repack per bounce.  Fencing serializes host<->device, so the sum
overstates the fused pass slightly — use the unfenced total (also printed)
as ground truth and the fenced split for attribution.

Usage:  python -u experiments/prof_host.py [width height spp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.ops import rng as rng_mod
from pathtracerwithcuda_tpu.render import wavefront as wf
from pathtracerwithcuda_tpu.scene.build import build_scene_data
from pathtracerwithcuda_tpu.scene.examples import (
    flagship_camera,
    flagship_config,
    flagship_scene,
)


def fence(x):
    jax.block_until_ready(x)
    return x


def main(width=1920, height=1080, spp=1):
    config = flagship_config(width=width, height=height, max_tracer_depth=8,
                             spp_per_pass=spp, loop_mode="host")
    if os.environ.get("PT_REPACK_KEY"):
        config = config.replace(repack_key=os.environ["PT_REPACK_KEY"])
    if os.environ.get("PT_TRAVERSAL_KERNEL"):
        config = config.replace(traversal_kernel=os.environ["PT_TRAVERSAL_KERNEL"])
    scene = build_scene_data(flagship_scene(), config)
    camera = flagship_camera(width, height)
    order, _ = wf.render_order(config.width, config.height)
    all_pixel_ids = jnp.asarray(order)
    base_key = jax.random.PRNGKey(0)

    from pathtracerwithcuda_tpu.ops import traversal_pallas as _tp

    p = int(all_pixel_ids.shape[0])
    chunk = _tp.CHUNK_PACKETS * _tp.PACKET
    use_packets = wf._use_packet_kernel(scene, config)
    ladder = wf._bucket_ladder(
        (p + chunk - 1) // chunk * chunk if use_packets else p)
    wide = wf._wide_ok(scene, config) if use_packets else None
    print(f"pixels={p} ladder={ladder} packets={use_packets} "
          f"kernel={'wide' if wide is not None else 'row'}", flush=True)
    if wide is not None:
        tables = wf._pack_wide_tables_jit(
            jnp.asarray(wide.src), jnp.asarray(wide.meta), scene,
            scene.leaf_size)
    else:
        tables = wf._pack_tables_jit(scene, scene.leaf_size)
    fence(tables)

    if config.repack_key.startswith("cell"):
        box_lo = jnp.min(scene.bvh_min, axis=0)
        box_hi = jnp.max(scene.bvh_max, axis=0)
    else:
        box_lo = box_hi = jnp.zeros((3,), jnp.float32)

    def traverse(o, d, b):
        if wide is not None:
            return wf._traverse_wide_jit(
                o, d, b, *tables, num_wide=wide.num_wide,
                num_tris=scene.num_triangles, leaf_k=scene.leaf_size)
        return wf._traverse_fixed_jit(
            o, d, b, *tables, num_nodes=scene.num_bvh_nodes,
            num_tris=scene.num_triangles, leaf_k=scene.leaf_size)

    def one_pass(fenced: bool, record=None):
        t_all0 = time.perf_counter()
        for s in range(config.spp_per_pass):
            key = rng_mod.pass_key(base_key, s)
            pixel_ids = all_pixel_ids
            t0 = time.perf_counter()
            state = wf._raygen_jit(camera, config, key, pixel_ids)
            if fenced:
                fence(state)
                record["raygen"] += time.perf_counter() - t0
            live_ids = jnp.arange(p, dtype=jnp.int32)
            radiance_full = jnp.zeros((p, 3), jnp.float32)
            p_state = (p + chunk - 1) // chunk * chunk
            t0 = time.perf_counter()
            if p_state != p:
                state, pixel_ids, live_ids, b = wf._pad_state_jit(
                    state, pixel_ids, live_ids, scene, p_state)
            else:
                b = wf._seed_bound_jit(state, scene, config, key, 0, pixel_ids, False)
            if fenced:
                fence(b)
                record["pad"] += time.perf_counter() - t0
            cur = p_state
            for depth in range(config.max_tracer_depth):
                t0 = time.perf_counter()
                tri_full = traverse(state.origin, state.direction, b)
                if fenced:
                    fence(tri_full)
                    record[f"traverse_d{depth}"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                state, alive = wf._bounce_with_tri_jit(
                    state, scene, config, key, depth, pixel_ids, tri_full)
                count = int(alive)  # device sync either way (host loop needs it)
                if fenced:
                    record["shade"] += time.perf_counter() - t0
                    record[f"live_d{depth}"] = max(
                        record.get(f"live_d{depth}", 0), count)
                if count == 0:
                    break
                if depth < config.max_tracer_depth - 1:
                    bucket = wf._bucket_for(count, cur, ladder)
                    t0 = time.perf_counter()
                    state, pixel_ids, live_ids, radiance_full, b = \
                        wf._repack_jit(
                            state, pixel_ids, live_ids, radiance_full, scene,
                            bucket, config.repack_key, box_lo, box_hi)
                    if fenced:
                        fence(radiance_full)
                        record["repack"] += time.perf_counter() - t0
                    cur = bucket
            t0 = time.perf_counter()
            radiance_full = wf._flush_jit(radiance_full, live_ids, state.radiance)
            if fenced:
                fence(radiance_full)
                record["flush"] += time.perf_counter() - t0
        fence(radiance_full)
        np.asarray(radiance_full[0])
        return time.perf_counter() - t_all0

    # warm-up / compile
    one_pass(False)
    # unfenced ground truth
    t_un = min(one_pass(False) for _ in range(2))
    # fenced attribution
    from collections import defaultdict
    rec = defaultdict(float)
    t_f = one_pass(True, rec)
    print(f"unfenced pass: {t_un:.3f}s   fenced pass: {t_f:.3f}s", flush=True)
    trav = sum(v for k, v in rec.items() if k.startswith("traverse"))
    for k in sorted(rec):
        print(f"  {k:14s} {rec[k]*1e3:9.1f} ms")
    print(f"  {'traverse_total':14s} {trav*1e3:9.1f} ms")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 1920, int(a[1]) if len(a) > 1 else 1080,
         int(a[2]) if len(a) > 2 else 1)
