"""Per-stage, per-bounce timing of the host render loop on TPU.

Mirrors render.wavefront.trace_radiance_host but forces a device fence +
readback around every stage dispatch, so the report attributes wall time to
pad / traverse / shade / repack per bounce.

Run from the repo root:  python -c "import sys; sys.argv=['x']; exec(open('experiments/prof_stages.py').read())"
"""

from __future__ import annotations

import time

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


FENCES_ON = False


def fence(x):
    # tiny on-device slice → 4-byte D2H. Readback/slice executables dispatched
    # BEFORE the pallas program's first execution poison it on the axon tunnel
    # (InvalidArgument) — so rep 0 runs the exact production sequence with
    # fences disabled, and only later reps fence between stages.
    if not FENCES_ON:
        return
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0:1])


def run(width=1920, height=1080, depth=8, repeat=2):
    config = flagship_config(width=width, height=height, max_tracer_depth=depth,
                             spp_per_pass=1, loop_mode="host")
    scene = build_scene_data(flagship_scene(), config)
    camera = flagship_camera(width, height)
    print(f"scene: tris={scene.num_triangles} nodes={scene.num_bvh_nodes} "
          f"leaf={scene.leaf_size}")

    order, _ = wf.render_order(config.width, config.height)
    key = rng_mod.pass_key(jax.random.PRNGKey(0), 0)

    # warm-up/compile with the REAL production loop (the manual loop below is
    # stage-identical, but on the axon tunnel only this exact call sequence
    # is known-good for first execution)
    stats = {}
    r = wf.trace_radiance_host(scene, camera, config, key, stats=stats)
    np.asarray(r[0])
    print("production warm-up ok; segments:", stats["segments"])

    global FENCES_ON
    for rep in range(1, repeat + 1):
        FENCES_ON = rep > 1
        pixel_ids = jnp.asarray(order)
        p = int(pixel_ids.shape[0])
        ladder = wf._bucket_ladder(p)
        p_fixed = ((p + wf._COMPACT_ALIGN - 1) // wf._COMPACT_ALIGN) * wf._COMPACT_ALIGN
        tables = wf._pack_tables_jit(scene, scene.leaf_size)
        state = wf._raygen_jit(camera, config, key, pixel_ids)
        live_ids = jnp.arange(p, dtype=jnp.int32)
        radiance_full = jnp.zeros((p, 3), jnp.float32)
        fence(state)
        cur = p
        count = p
        rows = []
        t_total = time.perf_counter()
        for d in range(config.max_tracer_depth):
            t0 = time.perf_counter()
            o, dd, b = wf._pad_rays_jit(state, scene, p_fixed)
            fence(b)
            t1 = time.perf_counter()
            tri_full = wf._traverse_fixed_jit(
                o, dd, b, *tables, num_nodes=scene.num_bvh_nodes,
                num_tris=scene.num_triangles, leaf_k=scene.leaf_size)
            fence(tri_full)
            t2 = time.perf_counter()
            state, alive = wf._bounce_with_tri_jit(
                state, scene, config, key, d, pixel_ids, tri_full)
            fence(alive)
            t3 = time.perf_counter()
            count = int(alive)
            t4 = time.perf_counter()
            if count and d < config.max_tracer_depth - 1:
                bucket = wf._bucket_for(count, cur, ladder)
                state, pixel_ids, live_ids, radiance_full, _b = wf._repack_jit(
                    state, pixel_ids, live_ids, radiance_full, scene, bucket)
                fence(radiance_full)
                cur = bucket
            t5 = time.perf_counter()
            rows.append((d, count, cur,
                         (t1 - t0) * 1e3, (t2 - t1) * 1e3, (t3 - t2) * 1e3,
                         (t4 - t3) * 1e3, (t5 - t4) * 1e3))
            if count == 0:
                break
        total = (time.perf_counter() - t_total) * 1e3
        if rep == 1:
            print("(manual-loop warm pass done, unfenced total "
                  f"{total:.0f} ms)")
            continue
        print(f"--- rep {rep}: total {total:.0f} ms")
        print(f"{'d':>2} {'alive':>9} {'wave':>9} {'pad':>8} {'trav':>8} "
              f"{'shade':>8} {'sync':>8} {'repack':>8}")
        tsum = [0.0] * 5
        for r in rows:
            print(f"{r[0]:>2} {r[1]:>9} {r[2]:>9} "
                  f"{r[3]:>8.1f} {r[4]:>8.1f} {r[5]:>8.1f} {r[6]:>8.1f} {r[7]:>8.1f}")
            for i in range(5):
                tsum[i] += r[3 + i]
        print(f"   sums: pad={tsum[0]:.0f} trav={tsum[1]:.0f} shade={tsum[2]:.0f} "
              f"sync={tsum[3]:.0f} repack={tsum[4]:.0f} ms")


if __name__ == "__main__":
    run()
