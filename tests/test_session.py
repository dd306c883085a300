"""RenderSession live-edit semantics (reference UI handlers,
Core/path_tracer.cpp:109-369: every edit rewrites device data and resets
accumulation)."""

import os

import numpy as np
import pytest

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.materials import builtin_materials
from pathtracerwithcuda_tpu.render.session import RenderSession
from pathtracerwithcuda_tpu.scene.build import HostMesh, HostScene
from pathtracerwithcuda_tpu.scene.obj_loader import load_obj_python

CUBE = os.path.join(os.path.dirname(__file__), "..", "assets", "obj", "cube.obj")


def _session():
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [dict(mats["wall_white"]), dict(mats["light"]), dict(mats["red"])]
    host.sphere_centers = np.array([[0, -1001.0, 0], [0, 4.0, 0]], np.float32)
    host.sphere_radii = np.array([1000.0, 1.5], np.float32)
    host.sphere_material_ids = np.array([0, 1], np.int32)
    shapes = load_obj_python(CUBE)
    host.meshes = [
        HostMesh.from_shapes(shapes, [2], (0.0, 0.5, 0.0), (0.5, 0.5, 0.5), (0, 0, 0))
    ]
    config = RenderConfig(width=32, height=32, max_tracer_depth=3,
                          use_sky_box=False, use_sky=True)
    return RenderSession(host, config)


def test_edit_resets_accumulation():
    s = _session()
    s.render()
    s.render()
    assert s.pass_counter == 2
    before = s.image_u8().copy()
    s.set_sphere(1, center=(0.5, 4.0, 0.0))
    assert s.pass_counter == 0
    s.render()
    after = s.image_u8()
    assert not np.array_equal(before, after)


def test_material_edit_changes_image():
    s = _session()
    s.render()
    red = s.image_u8().copy()
    mats = builtin_materials()
    s.set_material(2, dict(mats["wall_blue"]))
    s.render()
    blue = s.image_u8()
    assert not np.array_equal(red, blue)
    # determinism: same key + pass 0 → editing back restores the image
    s.set_material(2, dict(mats["red"]))
    s.render()
    assert np.array_equal(red, s.image_u8())


def test_transform_edit_moves_mesh():
    s = _session()
    s.render()
    a = s.image_u8().copy()
    s.set_mesh_transform(0, position=(2.0, 0.5, 0.0))
    assert np.allclose(s.host_scene.meshes[0].position, [2.0, 0.5, 0.0])
    s.render()
    assert not np.array_equal(a, s.image_u8())


def test_rotate_edit_rebakes():
    s = _session()
    v_before = s.host_scene.meshes[0].vertices.copy()
    s.set_mesh_rotate(0, (0.0, 45.0, 0.0))
    v_after = s.host_scene.meshes[0].vertices
    assert not np.allclose(v_before, v_after)
    # rotating back restores the original object-space vertices
    s.set_mesh_rotate(0, (0.0, 0.0, 0.0))
    assert np.allclose(s.host_scene.meshes[0].vertices, v_before, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    s = _session()
    s.render()
    s.render()
    path = str(tmp_path / "ck.npz")
    s.save_checkpoint(path)
    img = s.image_u8().copy()

    s2 = _session()
    s2.load_checkpoint(path)
    assert s2.pass_counter == 2
    assert np.array_equal(s2.image_u8(), img)
    # resuming continues deterministically from the same stream
    s.render()
    s2.render()
    assert np.array_equal(s.image_u8(), s2.image_u8())
