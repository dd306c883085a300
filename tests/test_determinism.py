"""Determinism + progressive accumulation semantics."""

import jax
import numpy as np

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.materials import builtin_materials
from pathtracerwithcuda_tpu.core.types import RenderCamera
from pathtracerwithcuda_tpu.ops import rng
from pathtracerwithcuda_tpu.render.wavefront import trace_radiance
from pathtracerwithcuda_tpu.scene.build import HostScene, build_scene_data


def _setup():
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["light"]]
    host.sphere_centers = np.array([[0, -1001.0, 0], [0, 3.0, 0]], np.float32)
    host.sphere_radii = np.array([1000.0, 1.0], np.float32)
    host.sphere_material_ids = np.array([0, 1], np.int32)
    config = RenderConfig(width=16, height=16, max_tracer_depth=3,
                          use_sky_box=False, use_sky=True)
    scene = build_scene_data(host, config)
    cam = RenderCamera.create(
        eye=(0, 1, 8.0), view=(0, 0, -1.0), up=(0, 1, 0),
        width=16, height=16, fov_x_deg=45.0, focal_distance=8.0,
    )
    return scene, cam, config


def test_same_key_identical():
    scene, cam, config = _setup()
    key = rng.pass_key(jax.random.PRNGKey(3), 0)
    a = np.asarray(trace_radiance(scene, cam, config, key))
    b = np.asarray(trace_radiance(scene, cam, config, key))
    assert np.array_equal(a, b)


def test_different_pass_differs():
    scene, cam, config = _setup()
    a = np.asarray(trace_radiance(scene, cam, config, rng.pass_key(jax.random.PRNGKey(3), 0)))
    b = np.asarray(trace_radiance(scene, cam, config, rng.pass_key(jax.random.PRNGKey(3), 1)))
    assert not np.array_equal(a, b)


def test_scan_matches_while_loop():
    """The differentiable (scan) and fast (while_loop) integrators agree."""
    scene, cam, config = _setup()
    key = rng.pass_key(jax.random.PRNGKey(3), 0)
    fast = np.asarray(trace_radiance(scene, cam, config, key, differentiable=False))
    diff = np.asarray(trace_radiance(scene, cam, config, key, differentiable=True))
    assert np.allclose(fast, diff, atol=1e-6)


def test_session_progressive_average():
    from pathtracerwithcuda_tpu.render.session import RenderSession

    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["light"]]
    host.sphere_centers = np.array([[0, -1001.0, 0], [0, 3.0, 0]], np.float32)
    host.sphere_radii = np.array([1000.0, 1.0], np.float32)
    host.sphere_material_ids = np.array([0, 1], np.int32)
    config = RenderConfig(width=16, height=16, max_tracer_depth=3,
                          use_sky_box=False, use_sky=True)
    sess = RenderSession(host, config)
    sess.render()
    one = sess.image_u8().astype(np.float64)
    for _ in range(7):
        sess.render()
    eight = sess.image_u8().astype(np.float64)
    assert sess.pass_counter == 8
    # more passes smooth the image; means should stay comparable
    assert abs(one.mean() - eight.mean()) < 30

    sess.clear()
    assert sess.pass_counter == 0
    assert np.asarray(sess.accum).max() == 0
