"""Distributional tests for the direction samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.ops.sampling import (
    cosine_hemisphere,
    ggx_half_vector,
    ggx_smith_g1,
    orthonormal_frame,
    remap_roughness,
    uniform_sphere,
)


def _uniforms(n, k):
    u = jax.random.uniform(jax.random.PRNGKey(7), (n, 2))
    return u[:, 0], u[:, 1]


def test_frame_orthonormal(rng_np):
    n = rng_np.normal(size=(512, 3))
    n = jnp.asarray(n / np.linalg.norm(n, axis=-1, keepdims=True), jnp.float32)
    vi, vj = orthonormal_frame(n)
    assert np.allclose(np.sum(np.asarray(vi) * np.asarray(n), axis=-1), 0, atol=1e-5)
    assert np.allclose(np.sum(np.asarray(vi) * np.asarray(vj), axis=-1), 0, atol=1e-5)
    assert np.allclose(np.linalg.norm(np.asarray(vi), axis=-1), 1, atol=1e-5)


def test_cosine_hemisphere_moments():
    n = 200_000
    u1, u2 = _uniforms(n, 2)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    d = np.asarray(cosine_hemisphere(normal, u1, u2))
    cos_t = d[:, 2]
    assert np.all(cos_t >= -1e-6)  # upper hemisphere
    # E[cos] = 2/3 for pdf ∝ cos
    assert abs(cos_t.mean() - 2.0 / 3.0) < 5e-3
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_uniform_sphere_stats():
    n = 200_000
    u1, u2 = _uniforms(n, 2)
    d = np.asarray(uniform_sphere(u1, u2))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    assert np.all(np.abs(d.mean(axis=0)) < 6e-3)


def test_ggx_concentration():
    """Smaller roughness concentrates micro-normals around the macro normal."""
    n = 50_000
    u1, u2 = _uniforms(n, 2)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    tight = np.asarray(ggx_half_vector(normal, jnp.full((n,), 0.01), u1, u2))[:, 2]
    loose = np.asarray(ggx_half_vector(normal, jnp.full((n,), 0.5), u1, u2))[:, 2]
    assert tight.mean() > 0.999
    assert loose.mean() < tight.mean()


def test_ggx_g1_limits():
    normal = jnp.asarray([[0.0, 0.0, 1.0]])
    micro = jnp.asarray([[0.0, 0.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])  # head-on view
    g = ggx_smith_g1(jnp.asarray([0.0]), normal, micro, d)
    assert np.isclose(np.asarray(g)[0], 1.0, atol=1e-5)
    # grazing with high roughness → strongly shadowed
    d_graze = jnp.asarray([[0.9999, 0.0, -0.0141]])
    g2 = ggx_smith_g1(jnp.asarray([1.0]), normal, micro, d_graze)
    assert np.asarray(g2)[0] < 0.1


def test_remap_roughness():
    r = np.asarray(remap_roughness(jnp.asarray([0.0, 0.3, 1.0])))
    assert np.isclose(r[0], 0.0)
    assert np.isclose(r[2], 0.238, atol=1e-6)
    assert np.isclose(r[1], 0.3**1.85 * 0.238, atol=1e-6)
