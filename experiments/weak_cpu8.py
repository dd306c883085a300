"""8-virtual-device weak-scaling proxy on the CPU mesh.

All 8 virtual devices timeshare the same host cores, so absolute times mean
nothing — but the ratio unsharded/sharded on the SAME total workload
quantifies the shard_map + per-chip-program overhead of the 8-way host
loop, which is the only per-chip tax of scaling out (the forward path has
zero collectives; rays never migrate chips).

Usage: python -u experiments/weak_cpu8.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.parallel.mesh import make_render_mesh
from pathtracerwithcuda_tpu.render import wavefront
from pathtracerwithcuda_tpu.scene.build import build_scene_data
from pathtracerwithcuda_tpu.scene.examples import (
    flagship_camera,
    flagship_config,
    flagship_scene,
)


def timed(scene, camera, config, mesh, passes=3):
    base_key = jax.random.PRNGKey(0)
    accum = jnp.zeros((config.pixel_count, 3), jnp.float32)
    accum = wavefront.render_pass_host(scene, camera, config, accum, 0,
                                       base_key, mesh=mesh)
    jax.block_until_ready(accum)
    np.asarray(accum[0])
    t0 = time.perf_counter()
    for i in range(1, 1 + passes):
        accum = wavefront.render_pass_host(scene, camera, config, accum, i,
                                           base_key, mesh=mesh)
    np.asarray(accum[0])
    return (time.perf_counter() - t0) / passes


def main():
    config = flagship_config(width=512, height=256, max_tracer_depth=6,
                             spp_per_pass=1, loop_mode="host")
    scene = build_scene_data(flagship_scene(seg_u=96, seg_v=86), config)
    camera = flagship_camera(config.width, config.height)
    dt_plain = timed(scene, camera, config, None)
    dt_8way = timed(scene, camera, config, make_render_mesh(8))
    print(f"unsharded: {dt_plain*1e3:.0f} ms   8-way shard_map: "
          f"{dt_8way*1e3:.0f} ms   efficiency proxy: {dt_plain/dt_8way:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
