"""Texture, cube-map and procedural-sky sampling.

Gather-heavy: textures live as one flat f32 RGB table (TextureAtlas) and the
cube map as a dense (6, L, L, 3) array, so each lane does plain int32 gathers
into HBM-resident arrays.  Face/texel selection is branchless arithmetic.

Reference semantics: texture_wrapper::sample_texture (Core/texture.h:15-79)
— UV wrap by fractional part, y flipped ((1-v)*(h-1)), nearest = truncate,
bilinear = 4-tap lerp; cube_map::get_background_color (Core/cube_map.h:20-119)
with direction→face+UV per Math/cuda_math.hpp:56-126; procedural sky gradient
(Core/cube_map.h:110-116).

Convention: row 0 of every stored image is the *visual top* (v = 1), matching
``y = (1 - v) * (h - 1)`` indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracerwithcuda_tpu.core.types import TextureAtlas
from pathtracerwithcuda_tpu.ops.linalg import dot

Array = jnp.ndarray


def _bilinear_gather(fetch, x_real, y_real, wm1, hm1):
    """4-tap bilinear around (x_real, y_real); fetch(x_int, y_int) -> (..., 3)."""
    x0 = jnp.clip(jnp.floor(x_real), 0.0, wm1).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(x_real), 0.0, wm1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y_real), 0.0, hm1).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(y_real), 0.0, hm1).astype(jnp.int32)
    tx = (x_real - jnp.floor(x_real))[..., None]
    ty = (y_real - jnp.floor(y_real))[..., None]
    c00 = fetch(x0, y0)
    c10 = fetch(x1, y0)
    c01 = fetch(x0, y1)
    c11 = fetch(x1, y1)
    bottom = c00 * (1.0 - tx) + c10 * tx
    top = c01 * (1.0 - tx) + c11 * tx
    return bottom * (1.0 - ty) + top * ty


def _bilinear_quad(quad_fetch, x_real, y_real, wm1, hm1):
    """Bilinear from a precomputed neighborhood table: quad_fetch(x0, y0)
    returns (..., 12) = [c(x0,y0), c(x0+1,y0), c(x0,y0+1), c(x0+1,y0+1)]
    with edge-clamped neighbors.  Radiometrically identical to
    _bilinear_gather: whenever clip(ceil(x)) != min(x0+1, w-1) the blend
    weight of that tap is exactly 0.  ONE per-lane gather instead of four —
    TPU gathers pay per row, not per row width."""
    x0 = jnp.clip(jnp.floor(x_real), 0.0, wm1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y_real), 0.0, hm1).astype(jnp.int32)
    tx = (x_real - jnp.floor(x_real))[..., None]
    ty = (y_real - jnp.floor(y_real))[..., None]
    q = quad_fetch(x0, y0)
    bottom = q[..., 0:3] * (1.0 - tx) + q[..., 3:6] * tx
    top = q[..., 6:9] * (1.0 - tx) + q[..., 9:12] * tx
    return bottom * (1.0 - ty) + top * ty


def _atlas_quad_table(atlas: TextureAtlas) -> Array:
    """(T, 12) per-texel 2x2 neighborhood of the packed atlas, built with
    TABLE-sized ops (3 gathers over T texels + searchsorted layout recovery)
    — worth it whenever the wavefront is much larger than the atlas.
    Differentiable w.r.t. atlas.data (indices are integer-valued)."""
    t = atlas.data.shape[0]
    ids = jnp.arange(t, dtype=jnp.int32)
    tex = jnp.searchsorted(atlas.offset, ids, side="right").astype(jnp.int32) - 1
    off = atlas.offset[tex]
    w = atlas.width[tex]
    h = atlas.height[tex]
    rem = ids - off
    y = rem // w
    x = rem - y * w
    xr = jnp.minimum(x + 1, w - 1)
    yd = jnp.minimum(y + 1, h - 1)
    d = atlas.data
    return jnp.concatenate(
        [d, d[off + y * w + xr], d[off + yd * w + x], d[off + yd * w + xr]],
        axis=1)


def _env_quad_table(env_faces: Array) -> Array:
    """(6*L*L, 12) neighborhood table of the cube map (neighbors clamped
    WITHIN each face, matching the 4-tap clamp semantics)."""
    length = env_faces.shape[1]
    flat = env_faces.reshape(-1, 3)
    n = flat.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    x = jax.lax.rem(ids, length)
    y = jax.lax.rem(ids // length, length)
    rowbase = ids - x
    xr = jnp.minimum(x + 1, length - 1)
    down = jnp.where(y + 1 < length, rowbase + length, rowbase)
    return jnp.concatenate(
        [flat, flat[rowbase + xr], flat[down + x], flat[down + xr]], axis=1)


def sample_atlas(atlas: TextureAtlas, texture_id: Array, uv: Array, use_bilinear: bool) -> Array:
    """Sample per-lane textures from the packed atlas.

    texture_id: (P,) int32 (entries may be -1; caller masks the result),
    uv: (P, 2).  Returns (P, 3).
    """
    tid = jnp.clip(texture_id, 0, atlas.count - 1)
    w = atlas.width[tid]
    h = atlas.height[tid]
    off = atlas.offset[tid]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    wm1 = (w - 1).astype(jnp.float32)
    hm1 = (h - 1).astype(jnp.float32)
    x_real = u * wm1
    y_real = (1.0 - v) * hm1

    def fetch(x, y):
        return atlas.data[off + y * w + x]

    if use_bilinear:
        p = texture_id.shape[0] if texture_id.ndim else 1
        if 4 * atlas.data.shape[0] <= p:
            quad = _atlas_quad_table(atlas)
            return _bilinear_quad(lambda x, y: quad[off + y * w + x],
                                  x_real, y_real, wm1, hm1)
        return _bilinear_gather(fetch, x_real, y_real, wm1, hm1)
    x = jnp.clip(x_real, 0.0, wm1).astype(jnp.int32)
    y = jnp.clip(y_real, 0.0, hm1).astype(jnp.int32)
    return fetch(x, y)


def direction_to_cube_uv(direction: Array):
    """Branchless direction → (face, u, v) (Math/cuda_math.hpp:56-126).

    Face ids: 0:+x 1:-x 2:+y 3:-y 4:+z 5:-z.  Ties on |axis| resolve in the
    reference's if-chain order (later blocks overwrite), i.e. z beats y beats x.
    """
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # reference evaluates x-face, then y-face, then z-face conditions, each
    # overwriting — replicate by selecting z first, then y, then x.
    x_major = (ax >= ay) & (ax >= az)
    y_major = (ay >= ax) & (ay >= az)
    z_major = (az >= ax) & (az >= ay)

    face = jnp.where(x_major, jnp.where(x > 0, 0, 1), 0)
    uc = jnp.where(x_major, jnp.where(x > 0, -z, z), 0.0)
    vc = jnp.where(x_major, y, 0.0)
    ma = jnp.where(x_major, ax, 1.0)

    face = jnp.where(y_major, jnp.where(y > 0, 2, 3), face)
    uc = jnp.where(y_major, x, uc)
    vc = jnp.where(y_major, jnp.where(y > 0, -z, z), vc)
    ma = jnp.where(y_major, ay, ma)

    face = jnp.where(z_major, jnp.where(z > 0, 4, 5), face)
    uc = jnp.where(z_major, jnp.where(z > 0, x, -x), uc)
    vc = jnp.where(z_major, y, vc)
    ma = jnp.where(z_major, az, ma)

    ma = jnp.maximum(ma, 1e-20)
    u = 0.5 * (uc / ma + 1.0)
    v = 0.5 * (vc / ma + 1.0)
    return face, u, v


def sample_cube_map(env_faces: Array, direction: Array, use_bilinear: bool) -> Array:
    """env_faces: (6, L, L, 3); direction: (P, 3) -> (P, 3)."""
    length = env_faces.shape[1]
    face, u, v = direction_to_cube_uv(direction)
    lm1 = jnp.float32(length - 1)
    x_real = u * lm1
    y_real = (1.0 - v) * lm1

    # ONE linear row gather instead of a 3-index-vector gather: the general
    # gather XLA emits for env_faces[face, y, x] cost ~113 ms per 2M-lane
    # bounce on v5e; the flattened row fetch is the same pattern as the
    # material/triangle row gathers in render/wavefront.bounce_step
    flat = env_faces.reshape(-1, 3)

    def fetch(x, y):
        return flat[(face * length + y) * length + x]

    if use_bilinear:
        p = direction.shape[0] if direction.ndim > 1 else 1
        if 4 * flat.shape[0] <= p:
            quad = _env_quad_table(env_faces)
            return _bilinear_quad(
                lambda x, y: quad[(face * length + y) * length + x],
                x_real, y_real, lm1, lm1)
        return _bilinear_gather(fetch, x_real, y_real, lm1, lm1)
    x = jnp.clip(x_real, 0.0, lm1).astype(jnp.int32)
    y = jnp.clip(y_real, 0.0, lm1).astype(jnp.int32)
    return fetch(x, y)


_SKY_DIR = jnp.array([-0.41, 0.41, -0.82], jnp.float32)
_SKY_A = jnp.array([0.15, 0.3, 0.5], jnp.float32)
_SKY_B = jnp.array([1.0, 1.0, 1.0], jnp.float32)


def procedural_sky(direction: Array) -> Array:
    """Gradient sky (Core/cube_map.h:110-116)."""
    t = (dot(direction, _SKY_DIR) + 1.0) * 0.5
    return (1.0 - t)[..., None] * _SKY_A + t[..., None] * _SKY_B


def background_color(env_faces: Array, direction: Array, use_sky_box: bool,
                     use_sky: bool, use_bilinear: bool, has_env_map: bool) -> Array:
    """Environment radiance on miss (Core/cube_map.h:20-119): cube map if
    enabled (and loaded), else procedural sky if enabled, else black."""
    if use_sky_box and has_env_map:
        return sample_cube_map(env_faces, direction, use_bilinear)
    if use_sky:
        return procedural_sky(direction)
    return jnp.zeros(direction.shape[:-1] + (3,), jnp.float32)
