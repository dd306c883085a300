"""Sharded rendering via shard_map.

The wavefront is split over the `rays` mesh axis: each chip traces its own
pixel slice end-to-end with the scene replicated, so the only collectives in
the forward path are (a) the psum over the optional `spp` axis when samples
are also sharded, and (b) nothing else — pixel ownership makes progressive
accumulation embarrassingly parallel (SURVEY.md §5: the reference's per-frame
"communication" is a single framebuffer memcpy).

Because all RNG is keyed on global pixel id (ops.rng), the sharded result is
bit-identical to the single-device render — tested on an 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.types import RenderCamera, SceneData
from pathtracerwithcuda_tpu.ops import rng
from pathtracerwithcuda_tpu.ops.tonemap import accumulate
from pathtracerwithcuda_tpu.parallel.mesh import RAY_AXIS, SAMPLE_AXIS
from pathtracerwithcuda_tpu.render.wavefront import trace_radiance


def _replicated(tree):
    return jax.tree.map(lambda _: P(), tree)


def distributed_trace(scene: SceneData, camera: RenderCamera, config: RenderConfig,
                      key, mesh: Mesh, pixel_ids=None, *,
                      differentiable: bool = False):
    """(P, 3) radiance for one pass, traced over the mesh.

    Pixels shard over RAY_AXIS (each chip receives a contiguous slice of
    `pixel_ids`; output row i is pixel_ids[i]'s radiance).  If the mesh has a
    SAMPLE_AXIS, each chip along it traces a different sample (key folded
    with the sample index) and the results are averaged with a psum — the
    output stays one sample-pass worth of radiance, at 1/s the variance.
    """
    p = config.pixel_count
    n_ray = mesh.shape[RAY_AXIS]
    if p % n_ray:
        raise ValueError(f"pixel count {p} not divisible by ray-axis size {n_ray}")
    has_spp = SAMPLE_AXIS in mesh.shape
    if pixel_ids is None:
        pixel_ids = jnp.arange(p, dtype=jnp.int32)

    spec_pixels = P(RAY_AXIS)

    def shard_fn(scene_, camera_, pids):
        if has_spp:
            s = jax.lax.axis_index(SAMPLE_AXIS)
            local_key = jax.random.fold_in(key, s)
            r = trace_radiance(scene_, camera_, config, local_key, pids,
                               differentiable=differentiable)
            return jax.lax.pmean(r, SAMPLE_AXIS)
        return trace_radiance(scene_, camera_, config, key, pids,
                              differentiable=differentiable)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(_replicated(scene), _replicated(camera), spec_pixels),
        out_specs=spec_pixels,
        check_vma=False,
    )
    return fn(scene, camera, pixel_ids)


@functools.partial(jax.jit, static_argnames=("config", "mesh", "differentiable"))
def distributed_render_pass(scene: SceneData, camera: RenderCamera,
                            config: RenderConfig, accum_image, pass_index,
                            base_key, mesh: Mesh,
                            differentiable: bool = False):
    """Sharded analog of render.wavefront.render_pass: one progressive pass,
    returning the new (P, 3) accumulation (sharded over RAY_AXIS, laid out in
    packet render order like the single-chip path — each chip owns a
    contiguous band of screen tiles)."""
    from pathtracerwithcuda_tpu.render.wavefront import render_order

    order, _ = render_order(config.width, config.height)
    pixel_ids = jnp.asarray(order)
    radiance = jnp.zeros((config.pixel_count, 3), jnp.float32)
    for s in range(config.spp_per_pass):
        key = rng.pass_key(base_key, pass_index * config.spp_per_pass + s)
        radiance = radiance + distributed_trace(
            scene, camera, config, key, mesh, pixel_ids,
            differentiable=differentiable,
        )
    radiance = radiance / config.spp_per_pass
    return accumulate(accum_image, radiance, config.max_tracer_depth)


def distributed_render_pass_host(scene: SceneData, camera: RenderCamera,
                                 config: RenderConfig, accum_image, pass_index,
                                 base_key, mesh: Mesh):
    """Sharded PRODUCTION render pass: the host-driven bounce loop — Pallas
    packet traversal, chip-local compaction + octant repack, host early exit —
    running per-chip under shard_map (render.wavefront.trace_radiance_host
    with mesh=...).  Unlike distributed_render_pass (the fused while-loop,
    kept for the differentiable path), this is the same code path the
    single-chip TPU benchmark runs; pixels shard over RAY_AXIS, scene
    replicated, zero collectives in the forward loop."""
    from pathtracerwithcuda_tpu.render.wavefront import render_pass_host

    return render_pass_host(scene, camera, config, accum_image, pass_index,
                            base_key, mesh=mesh)


def shard_accum_image(accum_image, mesh: Mesh):
    """Place the accumulation buffer sharded over the ray axis."""
    return jax.device_put(
        accum_image, NamedSharding(mesh, P(RAY_AXIS))
    )


def replicate_scene(scene: SceneData, mesh: Mesh) -> SceneData:
    """Replicate all scene buffers across the mesh (the default layout; see
    parallel.mesh docstring for the primitive-range sharding escape hatch)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), scene
    )
