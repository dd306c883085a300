"""Benchmark: rays/sec/chip on the flagship scene (BASELINE.json headline).

Renders the procedural flagship scene (≈66k-triangle GGX torus + textured
floor + glass sphere + env map) at 1080p, 4 spp, depth 8, on whatever chip
jax.devices() provides.  "Rays" counts actual traced path segments (active
lanes summed over bounces — the analog of the reference's wavefront size
after compaction each bounce), measured once with an instrumented pass, then
the uninstrumented renderer is timed.

Prints ONE JSON line:
  {"metric": "rays/sec/chip (fwd, flagship 1080p 4spp)",
   "value": N, "unit": "rays/s", "vs_baseline": N}

vs_baseline normalizes against the north-star target of 1e9 rays/s aggregate
on a 16-chip v5p slice → 6.25e7 rays/s per-chip share (BASELINE.json; the
reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

PER_CHIP_TARGET = 1e9 / 16.0


def count_ray_segments(scene, camera, config, key):
    """Instrumented pass: total active-lane bounce count."""
    from pathtracerwithcuda_tpu.ops import rng
    from pathtracerwithcuda_tpu.render import wavefront

    pixel_ids = jnp.arange(config.pixel_count, dtype=jnp.int32)

    @jax.jit
    def counted():
        ray_u = rng.raygen_uniforms(key, pixel_ids)
        from pathtracerwithcuda_tpu.ops.raygen import generate_rays

        origin, direction = generate_rays(camera, pixel_ids, ray_u,
                                          config.use_anti_alias)
        state = wavefront._initial_state(origin, direction, config)

        def body(carry, depth):
            s, total = carry
            total = total + jnp.sum(s.active.astype(jnp.int64))
            u = rng.bounce_uniforms(key, depth, pixel_ids)
            return (wavefront.bounce_step(s, scene, config, u), total), None

        (state, total), _ = jax.lax.scan(
            body, (state, jnp.int64(0)), jnp.arange(config.max_tracer_depth)
        )
        return total

    return int(counted())


def main():
    from pathtracerwithcuda_tpu.ops import rng as rng_mod
    from pathtracerwithcuda_tpu.render.wavefront import render_pass
    from pathtracerwithcuda_tpu.scene.build import build_scene_data
    from pathtracerwithcuda_tpu.scene.examples import (
        flagship_camera,
        flagship_config,
        flagship_scene,
    )

    spp = 4
    config = flagship_config(width=1920, height=1080, max_tracer_depth=8,
                             spp_per_pass=spp)
    scene = build_scene_data(flagship_scene(), config)
    camera = flagship_camera(config.width, config.height)
    base_key = jax.random.PRNGKey(0)
    accum = jnp.zeros((config.pixel_count, 3), jnp.float32)

    # ray-segment count for one sample of every pixel (sample 0)
    segments_per_sample = count_ray_segments(
        scene, camera, config, rng_mod.pass_key(base_key, 0)
    )
    rays_per_pass = segments_per_sample * spp  # spp samples per pass

    # warm up / compile
    accum = render_pass(scene, camera, config, accum, 0, base_key)
    accum.block_until_ready()

    # timed passes
    n_timed = 3
    t0 = time.perf_counter()
    for i in range(1, 1 + n_timed):
        accum = render_pass(scene, camera, config, accum, i, base_key)
    accum.block_until_ready()
    dt = (time.perf_counter() - t0) / n_timed

    rays_per_sec = rays_per_pass / dt
    print(json.dumps({
        "metric": "rays/sec/chip (fwd, flagship 1080p 4spp depth8)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / PER_CHIP_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
