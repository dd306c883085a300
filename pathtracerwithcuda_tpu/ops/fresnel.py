"""Exact unpolarized Fresnel (reference Core/fresnel.h).

Returns only the reflectance; the reference also computes a transmittance
field it never consumes (Core/fresnel.h:47, usage Kernel/path_tracer_kernel.cu:565)
— a quirk we drop.
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracerwithcuda_tpu.ops.linalg import dot, length


def fresnel_dielectric(normal, in_direction, n_in, n_out, refraction_direction):
    """Unpolarized dielectric reflectance with TIR (Core/fresnel.h:11-49).

    The TIR condition mirrors the reference: n_in > n_out and
    acos(cos_in) >= asin(n_out/n_in); additionally reflectance is forced to 1
    when the refraction direction degenerates (zero vector) or points to the
    wrong hemisphere.
    """
    cos_in = dot(normal, -in_direction)
    cos_out = dot(-normal, refraction_direction)

    tir = (n_in > n_out) & (
        jnp.arccos(jnp.clip(cos_in, -1.0, 1.0))
        >= jnp.arcsin(jnp.clip(n_out / jnp.maximum(n_in, 1e-20), -1.0, 1.0))
    )
    degenerate = (length(refraction_direction) <= 0.000005) | (cos_out < 0)

    rs_num = n_in * cos_in - n_out * cos_out
    rs_den = n_in * cos_in + n_out * cos_out
    rp_num = n_in * cos_out - n_out * cos_in
    rp_den = n_in * cos_out + n_out * cos_in
    rs = jnp.square(rs_num / jnp.where(rs_den == 0, 1.0, rs_den))
    rp = jnp.square(rp_num / jnp.where(rp_den == 0, 1.0, rp_den))
    r = 0.5 * (rs + rp)
    return jnp.where(tir | degenerate, 1.0, r)


def fresnel_conductor(normal, in_direction, n, k):
    """Unpolarized conductor reflectance from n, k (Core/fresnel.h:51-76)."""
    cos_in = dot(normal, -in_direction)
    nk2 = n * n + k * k
    cos2 = cos_in * cos_in
    two_n_cos = 2.0 * n * cos_in
    rs = (nk2 * cos2 - two_n_cos + 1.0) / (nk2 * cos2 + two_n_cos + 1.0)
    rp = (nk2 - two_n_cos + cos2) / (nk2 + two_n_cos + cos2)
    return 0.5 * (rs + rp)
