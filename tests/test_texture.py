import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.core.types import TextureAtlas
from pathtracerwithcuda_tpu.ops.texture import (
    direction_to_cube_uv,
    procedural_sky,
    sample_atlas,
    sample_cube_map,
)


def _checker(h, w):
    img = np.zeros((h, w, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    img[(yy + xx) % 2 == 0] = 1.0
    return img


def test_atlas_nearest_exact():
    img = _checker(4, 4)
    atlas = TextureAtlas.pack([img])
    # sample strict texel interiors (x_real = x + 0.25) so float32 rounding
    # at exact texel boundaries can't flip the truncation
    uv = []
    expect = []
    for y in range(3):
        for x in range(3):
            uv.append([(x + 0.25) / 3.0, 1.0 - (y + 0.25) / 3.0])
            expect.append(img[y, x])
    out = np.asarray(
        sample_atlas(atlas, jnp.zeros(len(uv), jnp.int32), jnp.asarray(uv, jnp.float32), False)
    )
    assert np.allclose(out, np.asarray(expect), atol=1e-6)


def test_atlas_bilinear_midpoint():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = 1.0  # top-left
    atlas = TextureAtlas.pack([img])
    out = np.asarray(
        sample_atlas(atlas, jnp.zeros(1, jnp.int32), jnp.asarray([[0.5, 0.5]]), True)
    )
    assert np.allclose(out, 0.25, atol=1e-6)


def test_atlas_two_textures_offsets():
    a = np.full((2, 2, 3), 0.25, np.float32)
    b = np.full((3, 3, 3), 0.75, np.float32)
    atlas = TextureAtlas.pack([a, b])
    out = np.asarray(
        sample_atlas(
            atlas, jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([[0.5, 0.5], [0.5, 0.5]]), False,
        )
    )
    assert np.allclose(out[0], 0.25) and np.allclose(out[1], 0.75)


def test_uv_wrap():
    img = _checker(4, 4)
    atlas = TextureAtlas.pack([img])
    base = np.asarray(
        sample_atlas(atlas, jnp.zeros(1, jnp.int32), jnp.asarray([[0.25, 0.75]]), True)
    )
    wrapped = np.asarray(
        sample_atlas(atlas, jnp.zeros(1, jnp.int32), jnp.asarray([[2.25, -1.25]]), True)
    )
    assert np.allclose(base, wrapped, atol=1e-6)


def test_cube_face_selection():
    dirs = jnp.asarray(
        [[1, 0.1, 0.1], [-1, 0, 0], [0.1, 1, 0.1], [0, -1, 0], [0, 0.1, 1], [0, 0, -1]],
        jnp.float32,
    )
    face, u, v = direction_to_cube_uv(dirs)
    assert list(np.asarray(face)) == [0, 1, 2, 3, 4, 5]
    u, v = np.asarray(u), np.asarray(v)
    assert np.all((u >= 0) & (u <= 1) & (v >= 0) & (v <= 1))


def test_cube_map_face_colors():
    faces = np.zeros((6, 2, 2, 3), np.float32)
    for i in range(6):
        faces[i, :, :, 0] = i / 5.0
    out = np.asarray(
        sample_cube_map(jnp.asarray(faces), jnp.asarray([[0.0, 1.0, 0.0]]), False)
    )
    assert np.isclose(out[0, 0], 2 / 5.0, atol=1e-6)


def test_sky_gradient():
    toward = np.asarray(procedural_sky(jnp.asarray([[-0.41, 0.41, -0.82]])))
    away = np.asarray(procedural_sky(jnp.asarray([[0.41, -0.41, 0.82]])))
    assert np.allclose(toward[0], 1.0, atol=1e-2)  # t≈1 → white
    assert np.allclose(away[0], [0.15, 0.3, 0.5], atol=1e-2)


def test_atlas_quad_path_matches_four_tap(rng_np):
    """The table-quad bilinear (one per-lane gather, used when the wavefront
    dwarfs the atlas) must match the 4-tap gather path exactly — the only
    differing taps carry a blend weight of exactly 0."""
    from pathtracerwithcuda_tpu.ops.texture import sample_atlas

    imgs = [rng_np.random((5, 7, 3)).astype(np.float32),
            rng_np.random((16, 16, 3)).astype(np.float32)]
    atlas = TextureAtlas.pack(imgs)
    t_total = int(atlas.data.shape[0])
    p = 4 * t_total + 128  # big enough to trigger the quad path
    tid = jnp.asarray(rng_np.integers(0, 2, p), jnp.int32)
    uv = jnp.asarray(rng_np.random((p, 2)) * 3.0 - 1.0, jnp.float32)
    got = sample_atlas(atlas, tid, uv, True)          # quad path (4T <= P)
    want = sample_atlas(atlas, tid[: 4 * t_total - 4],
                        uv[: 4 * t_total - 4], True)  # 4-tap path (4T > P)
    np.testing.assert_allclose(np.asarray(got)[: 4 * t_total - 4],
                               np.asarray(want), rtol=1e-6, atol=1e-7)


def test_env_quad_path_matches_four_tap(rng_np):
    from pathtracerwithcuda_tpu.ops.texture import sample_cube_map

    env = jnp.asarray(rng_np.random((6, 8, 8, 3)), jnp.float32)
    t_total = 6 * 8 * 8
    p = 4 * t_total + 128
    d = rng_np.normal(size=(p, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    got = sample_cube_map(env, d, True)               # quad path
    want = sample_cube_map(env, d[: 4 * t_total - 4], True)  # 4-tap path
    np.testing.assert_allclose(np.asarray(got)[: 4 * t_total - 4],
                               np.asarray(want), rtol=1e-6, atol=1e-7)
