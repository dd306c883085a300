"""Accumulation + tone mapping.

Reference pixel_256_transform_gamma_corrected_kernel
(Kernel/path_tracer_kernel.cu:627-682): per pass, clamp the pass radiance to
[0, 2*max_depth], add into the float accumulation image, divide by the pass
counter, optionally gamma-correct with exponent 1/2.2 computed as
exp(0.45454545 * log(x)), scale to [0,255] and cast to uint8.
"""

from __future__ import annotations

import jax.numpy as jnp

INV_GAMMA = 0.45454545


def accumulate(accum_image, pass_radiance, max_tracer_depth: int):
    """accum_image, pass_radiance: (P, 3).  Returns the new accumulation.

    The reference's `pass_counter == 1` overwrite is equivalent to starting
    from a zero accumulation buffer, which `clear()` guarantees.
    """
    clamped = jnp.clip(pass_radiance, 0.0, 2.0 * float(max_tracer_depth))
    return accum_image + clamped


def to_uint8(accum_image, pass_counter, gamma_correction: bool):
    """(P, 3) accumulated radiance -> (P, 3) uint8 display pixels."""
    pixel = accum_image / jnp.maximum(pass_counter, 1).astype(jnp.float32)
    if gamma_correction:
        # exp(ln(x)/2.2); ln(0) -> -inf -> exp -> 0, matching __expf/__logf
        pixel = jnp.exp(INV_GAMMA * jnp.log(jnp.maximum(pixel, 0.0)))
    return jnp.clip(pixel * 255.0, 0.0, 255.0).astype(jnp.uint8)
