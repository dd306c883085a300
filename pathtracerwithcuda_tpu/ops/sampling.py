"""Direction sampling (reference Kernel/path_tracer_kernel.cu:163-273).

All samplers are branchless over batched inputs.  The local frame
construction picks the first coordinate axis whose |component| < sqrt(1/3)
exactly as the reference does, so sampled directions match the oracle
bit-for-bit given the same uniforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracerwithcuda_tpu.ops.linalg import cross, dot, normalize

TWO_PI = 6.283185307179586
SQRT_ONE_THIRD = 0.5773502691896258


def orthonormal_frame(normal):
    """(i, j) tangent/bitangent per reference axis-pick rule
    (Kernel/path_tracer_kernel.cu:175-189)."""
    ax = jnp.abs(normal[..., 0:1])
    ay = jnp.abs(normal[..., 1:2])
    ex = jnp.zeros_like(normal).at[..., 0].set(1.0)
    ey = jnp.zeros_like(normal).at[..., 1].set(1.0)
    ez = jnp.zeros_like(normal).at[..., 2].set(1.0)
    any_dir = jnp.where(ax < SQRT_ONE_THIRD, ex, jnp.where(ay < SQRT_ONE_THIRD, ey, ez))
    vec_i = normalize(cross(normal, any_dir))
    vec_j = cross(normal, vec_i)
    return vec_i, vec_j


def _from_frame(normal, cos_theta, sin_theta, phi):
    vec_i, vec_j = orthonormal_frame(normal)
    return (
        cos_theta[..., None] * normal
        + (jnp.cos(phi) * sin_theta)[..., None] * vec_i
        + (jnp.sin(phi) * sin_theta)[..., None] * vec_j
    )


def cosine_hemisphere(normal, u1, u2):
    """Cosine-weighted hemisphere (reference :163-192)."""
    cos_theta = jnp.sqrt(u1)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return _from_frame(normal, cos_theta, sin_theta, u2 * TWO_PI)


def ggx_half_vector(normal, roughness, u1, u2):
    """GGX-distributed micro-normal (reference :194-223):
    theta = atan(a * sqrt(u) / sqrt(1-u)).

    cos/sin of the atan are evaluated algebraically — for t = tan(theta),
    cos(theta) = rsqrt(1 + t^2) and sin(theta) = t * cos(theta) — one
    rsqrt instead of three transcendental polynomials on the VPU.  Same
    function to f32 rounding (the oracle keeps the literal atan form and
    the goldens compare within tolerance)."""
    t = roughness * jnp.sqrt(u1) / jnp.sqrt(jnp.maximum(1.0 - u1, 1e-20))
    cos_theta = jax.lax.rsqrt(1.0 + t * t)
    sin_theta = t * cos_theta
    return _from_frame(normal, cos_theta, sin_theta, u2 * TWO_PI)


def uniform_sphere(u1, u2):
    """Isotropic sphere direction (reference :225-236); note the reference's
    convention returns (cos_theta, cos(phi) sin_theta, sin(phi) sin_theta)."""
    cos_theta = u1 * 2.0 - 1.0
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = u2 * TWO_PI
    return jnp.stack(
        [cos_theta, jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta], axis=-1
    )


def ggx_smith_g1(roughness, macro_normal, micro_normal, ray_direction):
    """Smith shadowing-masking G1 (reference :251-273)."""
    v = -ray_direction
    v_dot_n = dot(v, macro_normal)
    v_dot_m = dot(v, micro_normal)
    # sign product, not a division, so v·n == 0 can't poison gradients
    positive = (v_dot_m * v_dot_n) > 0.0
    a2 = roughness * roughness
    cos2 = v_dot_n * v_dot_n
    tan2 = (1.0 - cos2) / jnp.maximum(cos2, 1e-20)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2))
    return jnp.where(positive, g, 0.0)


def remap_roughness(roughness):
    """The reference's empirical GGX roughness remap
    (Kernel/path_tracer_kernel.cu:571): a = r^1.85 * 0.238.

    The base is floored at a tiny epsilon: jnp.power computes x^1.85 via
    exp(1.85 * log x), whose gradient is NaN at exactly 0."""
    return jnp.power(jnp.maximum(roughness, 1e-8), 1.85) * 0.238
