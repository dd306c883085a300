"""Native C++ components vs Python fallbacks (skipped if no toolchain)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracerwithcuda_tpu.bvh.flatten import leaf_runs, validate
from pathtracerwithcuda_tpu.native import (
    native_available,
    native_build_sah,
    native_load_obj,
)
from pathtracerwithcuda_tpu.ops.traversal import (
    brute_force_nearest_triangle,
    traverse_bvh,
)
from pathtracerwithcuda_tpu.scene.obj_loader import load_obj_python

needs_native = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")

OBJ_SAMPLE = """
# sample
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 0 1
g first
f 1/1/1 2/2/1 3/3/1
g second
f 2/2/1 4//1 3/3
f 1 2 4 3
"""


@needs_native
def test_obj_matches_python(tmp_path):
    p = tmp_path / "sample.obj"
    p.write_text(OBJ_SAMPLE)
    a = load_obj_python(str(p))
    b = native_load_obj(str(p))
    assert len(a) == len(b) == 2
    for sa, sb in zip(a, b):
        assert sa.name == sb.name
        assert sa.num_triangles == sb.num_triangles
        assert np.allclose(sa.vertices, sb.vertices)
        assert np.allclose(sa.normals, sb.normals)
        assert np.allclose(sa.uvs, sb.uvs)
    # quad fan-triangulated: shape 2 has 1 + 2 triangles
    assert b[1].num_triangles == 3


@needs_native
def test_obj_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    shapes = native_load_obj(str(p))
    assert shapes[0].num_triangles == 1
    assert np.allclose(shapes[0].vertices[0, 1], [1, 0, 0])
    # missing normals → face normal
    assert np.allclose(shapes[0].normals[0, 0], [0, 0, 1])


@needs_native
def test_native_bvh_invariants_and_hits(rng_np):
    n = 500
    base = rng_np.uniform(-5, 5, (n, 1, 3))
    tri = (base + rng_np.normal(size=(n, 3, 3)) * 0.4).astype(np.float32)
    bvh, perm = native_build_sah(tri[:, 0], tri[:, 1], tri[:, 2], leaf_size=4)
    assert not validate(bvh, n), validate(bvh, n)
    assert sorted(perm.tolist()) == list(range(n))
    start, count = leaf_runs(bvh.tri_slots)
    assert (count[start >= 0] >= 1).all()

    tri_p = tri[perm]
    r = 256
    o = rng_np.uniform(-8, 8, (r, 3)).astype(np.float32)
    d = rng_np.normal(size=(r, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    jv = [jnp.asarray(tri_p[:, i]) for i in range(3)]
    _, t_b = brute_force_nearest_triangle(jnp.asarray(o), jnp.asarray(d), *jv)
    _, t_t = traverse_bvh(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(bvh.node_min), jnp.asarray(bvh.node_max),
        jnp.asarray(bvh.next_index), jnp.asarray(bvh.tri_slots), *jv,
    )
    t_b, t_t = np.asarray(t_b), np.asarray(t_t)
    assert (np.isfinite(t_b) == np.isfinite(t_t)).all()
    fin = np.isfinite(t_b)
    assert np.allclose(t_b[fin], t_t[fin], rtol=1e-5, atol=1e-6)


@needs_native
def test_native_build_speed(rng_np):
    import time

    n = 60_000
    base = rng_np.uniform(-5, 5, (n, 1, 3))
    tri = (base + rng_np.normal(size=(n, 3, 3)) * 0.2).astype(np.float32)
    t0 = time.perf_counter()
    bvh, _ = native_build_sah(tri[:, 0], tri[:, 1], tri[:, 2], leaf_size=4)
    dt = time.perf_counter() - t0
    assert bvh.num_nodes > n / 4
    assert dt < 2.0  # interactive-rebuild class (Python takes ~10s here)


def test_native_image_decoder_bmp_tga(tmp_path, rng_np):
    """C++ BMP/TGA decoder (native/image_decoder.cpp — the FreeImage role of
    Others/image_loader.cpp) must match PIL on round-tripped files, for
    24-bit BMP and uncompressed/RLE/grayscale TGA."""
    from PIL import Image

    from pathtracerwithcuda_tpu.native import native_available, native_load_image
    from pathtracerwithcuda_tpu.utils.image_io import load_image_rgb

    if not native_available():
        pytest.skip("native toolchain unavailable")

    rgb = (rng_np.random((23, 37, 3)) * 255).astype(np.uint8)
    gray = (rng_np.random((16, 20)) * 255).astype(np.uint8)
    cases = []
    for name, arr, mode in (("a.bmp", rgb, "RGB"), ("b.tga", rgb, "RGB"),
                            ("c.tga", gray, "L")):
        p = str(tmp_path / name)
        Image.fromarray(arr, mode).save(p)
        cases.append(p)
    # RLE TGA
    p_rle = str(tmp_path / "d.tga")
    Image.fromarray(rgb, "RGB").save(p_rle, compression="tga_rle")
    cases.append(p_rle)

    for p in cases:
        with Image.open(p) as im:
            want = np.asarray(im.convert("RGB"), np.float32) / 255.0
        got = native_load_image(p)
        assert got is not None, p
        assert got.shape == want.shape, p
        np.testing.assert_allclose(got, want, atol=1.5 / 255.0)
        # the public loader routes .bmp/.tga through the native path
        via_io = load_image_rgb(p)
        np.testing.assert_allclose(via_io, want, atol=1.5 / 255.0)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/gpu_path_tracer/res/texture"),
    reason="reference asset tree not mounted")
def test_native_image_decoder_reference_assets():
    """Every BMP cube-map face and TGA texture the reference ships decodes
    byte-identically (within u8 rounding) to PIL."""
    import glob

    from PIL import Image

    from pathtracerwithcuda_tpu.native import native_available, native_load_image

    if not native_available():
        pytest.skip("native toolchain unavailable")
    root = "/root/reference/gpu_path_tracer/res/texture"
    paths = sorted(glob.glob(root + "/*/*.bmp"))[:6] + \
        sorted(glob.glob(root + "/*/*.tga"))[:6]
    assert paths
    for p in paths:
        with Image.open(p) as im:
            want = np.asarray(im.convert("RGB"), np.float32) / 255.0
        got = native_load_image(p)
        assert got is not None and got.shape == want.shape, p
        np.testing.assert_allclose(got, want, atol=1.5 / 255.0)
