"""Primary ray generation: pinhole + thin-lens DoF + AA jitter.

Reference generate_ray_kernel (Kernel/path_tracer_kernel.cu:299-379): canvas
point from per-axis FOV half-angle tangents, focal point at `focal_distance`
along the canvas direction, origin sampled on a disk aperture when
aperture_radius > 1e-5.
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracerwithcuda_tpu.core.types import RenderCamera
from pathtracerwithcuda_tpu.ops.linalg import cross, normalize

TWO_PI = 6.283185307179586
DEG2RAD = 0.017453292519943295


def generate_rays(camera: RenderCamera, pixel_ids, uniforms, use_anti_alias: bool):
    """uniforms: (P, 4) — jitter_x, jitter_y in [-0.5,0.5), aperture u1,u2 in [0,1).

    pixel_ids: (P,) int32 global pixel indices, row-major
    (pixel = y * width + x, y=0 is the image top as in the reference's
    pixel-index decomposition Kernel/path_tracer_kernel.cu:321-322) — passed
    explicitly so a sharded wavefront generates its own slice.

    Returns (origin, direction): (P, 3) each.
    """
    res_x = camera.resolution[0]
    res_y = camera.resolution[1]
    pixel = pixel_ids.astype(jnp.float32)
    image_y = jnp.floor(pixel / res_x)
    image_x = pixel - image_y * res_x

    jitter_x = uniforms[:, 0] if use_anti_alias else jnp.zeros_like(pixel)
    jitter_y = uniforms[:, 1] if use_anti_alias else jnp.zeros_like(pixel)

    # view is unit length, so the canvas sits at distance 1 from the eye
    distance = jnp.sqrt(jnp.sum(camera.view * camera.view))
    horizontal = normalize(cross(camera.view, camera.up))
    vertical = normalize(cross(horizontal, camera.view))
    x_axis = horizontal * (distance * jnp.tan(camera.fov[0] * 0.5 * DEG2RAD))
    y_axis = vertical * (distance * jnp.tan(-camera.fov[1] * 0.5 * DEG2RAD))

    nx = ((image_x + jitter_x) / (res_x - 1.0)) * 2.0 - 1.0
    ny = ((image_y + jitter_y) / (res_y - 1.0)) * 2.0 - 1.0

    canvas = camera.eye + camera.view + nx[:, None] * x_axis + ny[:, None] * y_axis
    on_image_plane = camera.eye + normalize(canvas - camera.eye) * camera.focal_distance

    angle = uniforms[:, 2] * TWO_PI
    r = camera.aperture_radius * jnp.sqrt(uniforms[:, 3])
    aperture_point = (
        camera.eye
        + (jnp.cos(angle) * r)[:, None] * horizontal
        + (jnp.sin(angle) * r)[:, None] * vertical
    )
    origin = jnp.where(camera.aperture_radius > 0.00001, aperture_point,
                       jnp.broadcast_to(camera.eye, aperture_point.shape))
    direction = normalize(on_image_plane - origin)
    return origin, direction
