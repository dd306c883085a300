"""TPU profiling harness for the packet traversal + host render loop.

Run ONE mode per process (the pallas kernel must only ever compile at a
single shape per process):

  python experiments/prof_traversal.py smoke      # tiny-scene kernel check
  python experiments/prof_traversal.py traverse   # 1080p primary-ray kernel
  python experiments/prof_traversal.py trace      # full 1-spp 1080p trace
  python experiments/prof_traversal.py pass       # full 4-spp render pass
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(width=1920, height=1080, depth=8, spp=4):
    from pathtracerwithcuda_tpu.scene.build import build_scene_data
    from pathtracerwithcuda_tpu.scene.examples import (
        flagship_camera,
        flagship_config,
        flagship_scene,
    )

    config = flagship_config(width=width, height=height, max_tracer_depth=depth,
                             spp_per_pass=spp, loop_mode="host")
    scene = build_scene_data(flagship_scene(), config)
    camera = flagship_camera(width, height)
    return scene, camera, config


def timed(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force readback
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n, out


def mode_smoke():
    # tiny scene, tiny wavefront — just prove the kernel compiles + matches
    from pathtracerwithcuda_tpu.ops.traversal import brute_force_nearest_triangle
    from pathtracerwithcuda_tpu.ops.traversal_pallas import traverse_bvh_packets
    from pathtracerwithcuda_tpu.bvh.build_sah import build_sah_bvh
    from pathtracerwithcuda_tpu.bvh.flatten import leaf_runs, permute_leaf_contiguous

    rng = np.random.default_rng(7)
    n = 500
    base = rng.uniform(-5, 5, (n, 1, 3))
    tri = (base + rng.normal(size=(n, 3, 3)) * 0.4).astype(np.float32)
    bvh = build_sah_bvh(tri[:, 0], tri[:, 1], tri[:, 2], leaf_size=8)
    bvh, perm = permute_leaf_contiguous(bvh)
    tri = tri[perm]
    start, count = leaf_runs(bvh.tri_slots)
    r = 2048
    o = rng.uniform(-8, 8, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    jv = [jnp.asarray(tri[:, i]) for i in range(3)]
    tb, t_b = brute_force_nearest_triangle(jnp.asarray(o), jnp.asarray(d), *jv)
    tp, t_p = traverse_bvh_packets(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(bvh.node_min),
        jnp.asarray(bvh.node_max), jnp.asarray(bvh.next_index),
        jnp.asarray(start), jnp.asarray(count), *jv, leaf_k=8)
    t_b, t_p = np.asarray(t_b), np.asarray(t_p)
    fin = np.isfinite(t_b)
    ok = (np.isfinite(t_b) == np.isfinite(t_p)).all() and np.allclose(
        t_b[fin], t_p[fin], rtol=1e-5, atol=1e-6)
    print("smoke match:", ok, "| hits:", int(fin.sum()), "/", r)
    # re-execute to catch the re-execution poison class of bugs
    tp2, _ = traverse_bvh_packets(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(bvh.node_min),
        jnp.asarray(bvh.node_max), jnp.asarray(bvh.next_index),
        jnp.asarray(start), jnp.asarray(count), *jv, leaf_k=8)
    print("re-exec match:", bool((np.asarray(tp2) == np.asarray(tp)).all()))


def mode_traverse():
    from pathtracerwithcuda_tpu.ops import rng as rng_mod
    from pathtracerwithcuda_tpu.ops.raygen import generate_rays
    from pathtracerwithcuda_tpu.render import wavefront
    from pathtracerwithcuda_tpu.render.wavefront import _traverse_fixed_jit

    scene, camera, config = build()
    print("use_packets:", wavefront._use_packet_kernel(scene, config))
    order, _ = wavefront.render_order(config.width, config.height)
    pixel_ids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(0), 0)
    ray_u = rng_mod.raygen_uniforms(key, pixel_ids)
    o, d = generate_rays(camera, pixel_ids, ray_u, config.use_anti_alias)
    p = o.shape[0]
    p_fixed = ((p + 131072 - 1) // 131072) * 131072
    o = jnp.pad(o, ((0, p_fixed - p), (0, 0)), constant_values=1e30)
    d = jnp.pad(d, ((0, p_fixed - p), (0, 0)), constant_values=1.0)
    b = jnp.pad(jnp.full((p,), jnp.inf), ((0, p_fixed - p),))

    from pathtracerwithcuda_tpu.render.wavefront import _pack_tables_jit

    tables = _pack_tables_jit(scene, scene.leaf_size)
    t0 = time.perf_counter()
    dt, tri = timed(_traverse_fixed_jit, o, d, b, *tables,
                    num_nodes=scene.num_bvh_nodes,
                    num_tris=scene.num_triangles, leaf_k=scene.leaf_size)
    print(f"compile+3 runs total {time.perf_counter()-t0:.1f}s")
    hits = int(jnp.sum(tri[:p] >= 0))
    print(f"primary traverse: {dt*1e3:.1f} ms for {p} rays "
          f"-> {p/dt/1e6:.1f} Mray/s | tri hits {hits}")


def mode_trace():
    from pathtracerwithcuda_tpu.ops import rng as rng_mod
    from pathtracerwithcuda_tpu.render import wavefront

    scene, camera, config = build(spp=1)
    print("use_packets:", wavefront._use_packet_kernel(scene, config))
    key = rng_mod.pass_key(jax.random.PRNGKey(0), 0)
    stats = {}
    t0 = time.perf_counter()
    r = wavefront.trace_radiance_host(scene, camera, config, key, stats=stats)
    np.asarray(r[0])
    print(f"first trace (compiles): {time.perf_counter()-t0:.1f}s")
    print("segments:", stats["segments"])
    print("wavefront:", stats["wavefront"])
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        r = wavefront.trace_radiance_host(scene, camera, config, key, stats={})
    np.asarray(r[0])
    dt = (time.perf_counter() - t0) / n
    rays = sum(stats["segments"])
    print(f"trace: {dt*1e3:.0f} ms | {rays} rays -> {rays/dt/1e6:.2f} Mray/s")


def mode_pass():
    from pathtracerwithcuda_tpu.ops import rng as rng_mod
    from pathtracerwithcuda_tpu.render import wavefront

    scene, camera, config = build(spp=4)
    key0 = rng_mod.pass_key(jax.random.PRNGKey(0), 0)
    stats = {}
    wavefront.trace_radiance_host(scene, camera, config, key0, stats=stats)
    rays_per_pass = sum(stats["segments"]) * config.spp_per_pass
    accum = jnp.zeros((config.pixel_count, 3), jnp.float32)
    accum = wavefront.render_pass_host(scene, camera, config, accum, 0,
                                       jax.random.PRNGKey(0))
    np.asarray(accum[0])
    t0 = time.perf_counter()
    n = 3
    for i in range(1, 1 + n):
        accum = wavefront.render_pass_host(scene, camera, config, accum, i,
                                           jax.random.PRNGKey(0))
    np.asarray(accum[0])
    dt = (time.perf_counter() - t0) / n
    print(f"pass: {dt*1e3:.0f} ms | {rays_per_pass} rays "
          f"-> {rays_per_pass/dt/1e6:.2f} Mray/s "
          f"| vs 62.5M target: {rays_per_pass/dt/6.25e7:.3f}")


if __name__ == "__main__":
    {"smoke": mode_smoke, "traverse": mode_traverse, "trace": mode_trace,
     "pass": mode_pass}[sys.argv[1]]()
