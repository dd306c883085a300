import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.ops.tonemap import accumulate, to_uint8


def test_accumulate_clamps():
    accum = jnp.zeros((4, 3))
    radiance = jnp.asarray([[0.5] * 3, [100.0] * 3, [-1.0] * 3, [0.0] * 3])
    out = np.asarray(accumulate(accum, radiance, max_tracer_depth=4))
    assert np.allclose(out[0], 0.5)
    assert np.allclose(out[1], 8.0)  # clamp to 2 * max_depth
    assert np.allclose(out[2], 0.0)


def test_to_uint8_gamma():
    accum = jnp.asarray([[0.5, 0.5, 0.5]])
    u8 = np.asarray(to_uint8(accum, 1, gamma_correction=True))
    expected = np.clip(np.exp(np.log(0.5) / 2.2) * 255.0, 0, 255).astype(np.uint8)
    assert np.all(np.abs(u8.astype(int) - int(expected)) <= 1)
    lin = np.asarray(to_uint8(accum, 1, gamma_correction=False))
    assert np.all(np.abs(lin.astype(int) - 127) <= 1)


def test_to_uint8_average_over_passes():
    accum = jnp.asarray([[2.0, 2.0, 2.0]])
    out4 = np.asarray(to_uint8(accum, 4, gamma_correction=False))
    assert np.all(np.abs(out4.astype(int) - 127) <= 1)


def test_black_is_black():
    u8 = np.asarray(to_uint8(jnp.zeros((2, 3)), 1, gamma_correction=True))
    assert np.all(u8 == 0)
