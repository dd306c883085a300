"""Small vector helpers over (..., 3) arrays (reference Math/cuda_math.hpp)."""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def dot(a: Array, b: Array) -> Array:
    return jnp.sum(a * b, axis=-1)


def length(a: Array) -> Array:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: Array, eps: float = 0.0) -> Array:
    n = length(a)
    return a / jnp.maximum(n, eps)[..., None] if eps else a / n[..., None]


def safe_normalize(a: Array) -> Array:
    return normalize(a, eps=1e-20)


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def reflect(normal: Array, in_direction: Array) -> Array:
    """Mirror reflection (reference Kernel/path_tracer_kernel.cu:46-52)."""
    return in_direction - 2.0 * dot(normal, in_direction)[..., None] * normal


def refract(normal: Array, in_direction: Array, n_in: Array, n_out: Array) -> Array:
    """Snell refraction; returns zero vector on total internal reflection.

    Semantics of reference Kernel/path_tracer_kernel.cu:54-83: expects the
    (possibly flipped) normal; the sign branch on n·i is kept via `where`.
    """
    i = -in_direction
    n_dot_i = dot(normal, i)
    ratio = n_in / n_out
    a = ratio * n_dot_i
    b = 1.0 - ratio * ratio * (1.0 - n_dot_i * n_dot_i)
    # double-where so the masked TIR branch can't emit NaN gradients
    # (sqrt'(0) is inf; 0 * inf = NaN in the vjp)
    b_safe = jnp.where(b > 0.0, b, 1.0)
    sqrt_b = jnp.sqrt(b_safe)
    sign = jnp.where(n_dot_i > 0, -1.0, 1.0)
    out = normal * (a + sign * sqrt_b)[..., None] - ratio[..., None] * i
    return jnp.where((b < 0.0)[..., None], jnp.zeros_like(out), out)
