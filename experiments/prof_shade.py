"""Attribute the shade program's cost (render/wavefront.bounce_step).

Times _bounce_with_tri_jit alone at production wavefront sizes, then
ablations: textures stripped, cube-map env replaced by procedural sky.

Usage: python -u experiments/prof_shade.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.ops import rng as rng_mod
from pathtracerwithcuda_tpu.ops.raygen import generate_rays
from pathtracerwithcuda_tpu.render import wavefront as wf
from pathtracerwithcuda_tpu.scene.build import build_scene_data
from pathtracerwithcuda_tpu.scene.examples import (
    flagship_camera,
    flagship_config,
    flagship_scene,
)


def timed_bounce(scene, config, state, key, pixel_ids, tri_full, n=5):
    out, alive = wf._bounce_with_tri_jit(state, scene, config, key, 0,
                                         pixel_ids, tri_full)
    jax.block_until_ready(out)
    np.asarray(out.radiance[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out, alive = wf._bounce_with_tri_jit(state, scene, config, key, 0,
                                             pixel_ids, tri_full)
    np.asarray(out.radiance[0])
    return (time.perf_counter() - t0) / n


def main():
    config = flagship_config(width=1920, height=1080, max_tracer_depth=8,
                             spp_per_pass=1, loop_mode="host")
    scene = build_scene_data(flagship_scene(), config)
    camera = flagship_camera(1920, 1080)
    order, _ = wf.render_order(config.width, config.height)
    all_ids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(0), 0)

    # texture-free variant of the same scene
    host2 = flagship_scene()
    host2.textures = []
    host2.materials[0] = dict(host2.materials[0])
    host2.materials[0]["diffuse_texture_id"] = -1
    scene_notex = build_scene_data(host2, config)
    config_sky = config.replace(use_sky_box=False, use_sky=True)

    rng_np = np.random.default_rng(0)
    for p in (2073600, 524288, 131072):
        pixel_ids = all_ids[:p]
        u = rng_mod.raygen_uniforms(key, pixel_ids)
        o, d = generate_rays(camera, pixel_ids, u, config.use_anti_alias)
        state = wf._initial_state(o, d, config)
        tri_full = jnp.asarray(
            rng_np.integers(-1, scene.num_triangles, p, dtype=np.int32))
        t_full = timed_bounce(scene, config, state, key, pixel_ids, tri_full)
        t_notex = timed_bounce(scene_notex, config, state, key, pixel_ids,
                               tri_full)
        t_sky = timed_bounce(scene, config_sky, state, key, pixel_ids,
                             tri_full)
        print(f"p={p}: shade {t_full*1e3:7.1f} ms | no-tex {t_notex*1e3:7.1f}"
              f" ms | proc-sky {t_sky*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
