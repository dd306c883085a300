import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.ops.fresnel import fresnel_conductor, fresnel_dielectric
from pathtracerwithcuda_tpu.ops.linalg import refract


def test_normal_incidence_matches_schlick_f0():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    n1, n2 = jnp.asarray([1.0]), jnp.asarray([1.5])
    rd = refract(n, d, n1, n2)
    f = np.asarray(fresnel_dielectric(n, d, n1, n2, rd))[0]
    f0 = ((1.5 - 1.0) / (1.5 + 1.0)) ** 2
    assert abs(f - f0) < 1e-5


def test_total_internal_reflection():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    # 60 degrees off-normal from glass (1.5) into air — beyond critical angle
    s, c = np.sin(np.radians(60)), np.cos(np.radians(60))
    d = jnp.asarray([[s, 0.0, -c]], jnp.float32)
    n1, n2 = jnp.asarray([1.5]), jnp.asarray([1.0])
    rd = refract(n, d, n1, n2)
    assert np.allclose(np.asarray(rd), 0.0)  # refract returns zero vector on TIR
    f = np.asarray(fresnel_dielectric(n, d, n1, n2, rd))[0]
    assert f == 1.0


def test_dielectric_range(rng_np):
    k = 512
    normal = np.zeros((k, 3), np.float32)
    normal[:, 2] = 1
    theta = rng_np.uniform(0, np.pi / 2 - 0.01, k)
    d = np.stack([np.sin(theta), np.zeros(k), -np.cos(theta)], -1).astype(np.float32)
    n1 = jnp.full((k,), 1.0)
    n2 = jnp.full((k,), 1.33)
    rd = refract(jnp.asarray(normal), jnp.asarray(d), n1, n2)
    f = np.asarray(fresnel_dielectric(jnp.asarray(normal), jnp.asarray(d), n1, n2, rd))
    assert np.all((f >= 0) & (f <= 1))
    # grazing incidence approaches 1
    assert f[np.argmax(theta)] > 0.5


def test_conductor_reflectance():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    # gold n,k from the built-in table
    f = np.asarray(fresnel_conductor(n, d, jnp.asarray([0.89863]), jnp.asarray([2.4584])))[0]
    # analytic normal-incidence conductor reflectance ((n-1)^2+k^2)/((n+1)^2+k^2)
    expected = ((0.89863 - 1) ** 2 + 2.4584**2) / ((0.89863 + 1) ** 2 + 2.4584**2)
    assert abs(f - expected) < 1e-5
