"""End-to-end renders of the reference's shipped scenes (res/scene/*.json) —
real OBJ meshes, TGA textures, and BMP cube maps through the full
parse → build → render pipeline (the reference's whole purpose,
Core/scene_parser.cpp:37-528).  Small frames keep the CPU walk affordable."""

import os

import numpy as np
import pytest

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.render.session import RenderSession
from pathtracerwithcuda_tpu.scene.cubemap_loader import load_cube_map
from pathtracerwithcuda_tpu.scene.parser import load_scene_file

from tests.conftest import REFERENCE_ROOT, requires_reference_assets

SCENE_DIR = os.path.join(REFERENCE_ROOT, "res", "scene")
TEXTURE_DIR = os.path.join(REFERENCE_ROOT, "res", "texture")


@requires_reference_assets
def test_dinosaur_scene_with_cubemap(tmp_path):
    """dinosaur.json: two reference OBJ meshes + a real 6-face BMP cube map,
    rendered to a PNG screenshot."""
    host = load_scene_file(os.path.join(SCENE_DIR, "dinosaur.json"))
    assert len(host.meshes) == 2
    assert sum(m.vertices.shape[0] for m in host.meshes) > 1000
    # the scene ships with the 2048^2 lycksele map; swap in the 512^2 lobby
    # map to keep the test light — still a real reference cube map
    host.env_faces = load_cube_map(TEXTURE_DIR, "lobby", "bmp")
    assert host.env_faces is not None and host.env_faces.shape[0] == 6

    config = RenderConfig(width=24, height=18, max_tracer_depth=3,
                          use_sky_box=True, use_sky=False)
    s = RenderSession(host, config)
    s.render()
    img = s.image_u8()
    assert img.shape == (18, 24, 3)
    # the cube map must actually reach escaping rays: the image is neither
    # black nor constant
    assert img.max() > 30 and img.std() > 5
    path = s.screenshot(str(tmp_path))
    assert os.path.isfile(path)


@requires_reference_assets
def test_vanille_textured_scene():
    """vanille.json: 25k-triangle character with five TGA textures — the
    texture pipeline against real reference assets (sponza-class content;
    sponza.obj itself is not shipped in the reference tree)."""
    host = load_scene_file(os.path.join(SCENE_DIR, "vanille.json"))
    assert len(host.textures) == 5
    assert all(t.ndim == 3 and t.shape[2] == 3 for t in host.textures)
    assert sum(m.vertices.shape[0] for m in host.meshes) > 20000

    config = RenderConfig(width=12, height=8, max_tracer_depth=2,
                          use_sky_box=False, use_sky=True)
    s = RenderSession(host, config)
    assert s.scene.textures.count == 5
    # at least one material actually references a texture
    d_ids = np.asarray(s.scene.materials.diffuse_texture_id)
    assert (d_ids >= 0).any()
    s.render()
    img = s.image_u8()
    assert img.shape == (8, 12, 3)
    assert img.std() > 1  # not a constant frame


@requires_reference_assets
def test_all_reference_scenes_parse_and_validate():
    """Every shipped scene JSON parses with validation on (schema-only load;
    full-load coverage above).  Reference set_scene_file_directory parity."""
    from pathtracerwithcuda_tpu.scene.parser import list_scene_files

    files = list_scene_files(SCENE_DIR)
    assert len(files) == 22
    for f in files:
        load_scene_file(f, load_assets=False)


@requires_reference_assets
def test_tex_cube_golden_256():
    """Reference-CLASS golden (VERDICT r4 next #8): a real shipped scene
    (tex_cube.json — textured cube + cube-map background) at 256^2 compared
    against the scalar oracle with the standard tolerance.  The shipped
    yokohama map isn't in the reference tree; the lobby map (also a real
    reference BMP cube map) stands in.  Slow: ~65k oracle pixels."""
    import jax

    from pathtracerwithcuda_tpu.core.types import RenderCamera
    from pathtracerwithcuda_tpu.ops import rng
    from pathtracerwithcuda_tpu.render.wavefront import trace_radiance
    from pathtracerwithcuda_tpu.scene.build import build_scene_data
    from tests import oracle
    from tests.test_render_golden import _camera_dict, _oracle_scene, _uniforms

    host = load_scene_file(os.path.join(SCENE_DIR, "tex_cube.json"))
    host.env_faces = load_cube_map(TEXTURE_DIR, "lobby", "bmp")
    assert host.env_faces is not None
    assert sum(m.vertices.shape[0] for m in host.meshes) == 12

    size = 256
    config = RenderConfig(width=size, height=size, max_tracer_depth=3,
                          use_sky_box=True, use_sky=False)
    scene = build_scene_data(host, config)
    cam = RenderCamera.create(
        eye=(2.2, 1.8, 3.6), view=(-0.48, -0.39, -0.78), up=(0, 1, 0),
        width=size, height=size, fov_x_deg=45.0, focal_distance=4.5,
    )
    key = rng.pass_key(jax.random.PRNGKey(0), 0)
    radiance = np.asarray(trace_radiance(scene, cam, config, key))
    raygen_u, bounce_u, rr_u = _uniforms(config, key)
    expected = oracle.render(_oracle_scene(host, scene), _camera_dict(cam),
                             config, raygen_u, bounce_u, rr_u)
    err = np.abs(radiance - expected).max(axis=-1)
    bad = (err > 2e-2).mean()
    assert bad <= 0.02, (
        f"{bad:.3%} pixels deviate by more than 2e-2 (max {err.max():.4f})")
    # the frame actually shows the textured cube against the map
    assert radiance.std() > 0.05
