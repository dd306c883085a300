"""Differentiable rendering: pixel gradients w.r.t. scene parameters.

This is the capability the reference does not have (BASELINE.json north
star).  Design:

  * the bounce loop is a fixed-depth `lax.scan` (render.wavefront with
    differentiable=True) so reverse-mode AD works;
  * BVH traversal returns only integer hit ids with inputs stop-gradient'ed
    (ops.traversal); hit distances/barycentrics are *recomputed* from the ids
    through plain Möller–Trumbore algebra, so gradients flow to vertices, ray
    origins/directions, and through them to camera and transform parameters;
  * discrete sampling decisions (lobe choice, medium event, ray kill) are
    treated as fixed w.r.t. parameters — the standard detached-sampling /
    reparameterized estimator: continuous factors (Fresnel weights appear in
    the lobe *choice* only; throughput factors, absorption, emission, textures)
    carry exact gradients;
  * visibility/silhouette gradients (moving geometry edges) are supplied by
    the SEPARATE boundary-term estimator in diff.edges (silhouette edge
    sampling for spheres and meshes, FD-verified) — add its surrogate to the
    loss when differentiating geometry/transform parameters.

All material table leaves (diffuse/emission/specular/roughness/IOR/extinction/
absorption/scattering), texture atlas data and environment faces are ordinary
differentiable pytree leaves of SceneData.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.types import RenderCamera, SceneData
from pathtracerwithcuda_tpu.ops import rng
from pathtracerwithcuda_tpu.render.wavefront import trace_radiance


def render_image(scene: SceneData, camera: RenderCamera, config: RenderConfig,
                 key, spp: int = 1):
    """Differentiable (P, 3) radiance averaged over spp samples."""
    out = jnp.zeros((config.pixel_count, 3), jnp.float32)
    for s in range(spp):
        out = out + trace_radiance(
            scene, camera, config, rng.pass_key(key, s), differentiable=True
        )
    return out / spp


@functools.partial(jax.jit, static_argnames=("config", "spp"))
def render_loss_and_grad(params, scene: SceneData, camera: RenderCamera,
                         config: RenderConfig, target, key, spp: int = 1):
    """L2 image loss + gradient w.r.t. `params` (a MaterialTable).

    target: (P, 3) reference radiance.  Returns (loss, grads) where grads has
    the MaterialTable structure.
    """

    def loss_fn(p):
        img = render_image(scene.replace(materials=p), camera, config, key, spp)
        return jnp.mean(jnp.square(img - target))

    return jax.value_and_grad(loss_fn)(params)
