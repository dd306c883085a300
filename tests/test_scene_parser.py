"""Scene/config parser tests, including the 22 reference scene files."""

import json
import os

import numpy as np
import pytest

from pathtracerwithcuda_tpu.config import BvhBuildMethod
from pathtracerwithcuda_tpu.scene.config_parser import load_config_file, parse_config_dict
from pathtracerwithcuda_tpu.scene.parser import (
    SceneParseError,
    list_scene_files,
    load_scene_file,
)
from tests.conftest import REFERENCE_ROOT, requires_reference_assets

SCENE_DIR = os.path.join(REFERENCE_ROOT, "res", "scene")


def _write(tmp_path, doc):
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_minimal_sphere_scene(tmp_path):
    path = _write(
        tmp_path,
        {
            "Sphere": [
                {"Material": "gold", "Center": "1.0 2.0 3.0", "Radius": "0.5"}
            ]
        },
    )
    scene = load_scene_file(path, asset_root=str(tmp_path))
    assert scene.sphere_centers.shape == (1, 3)
    assert np.allclose(scene.sphere_centers[0], [1, 2, 3])
    assert scene.sphere_radii[0] == 0.5
    # gold is a conductor
    mat = scene.materials[scene.sphere_material_ids[0]]
    assert mat["extinction"] > 0


def test_custom_material(tmp_path):
    path = _write(
        tmp_path,
        {
            "Material": [
                {
                    "Name": "mymat",
                    "Diffuse": "0.1 0.2 0.3",
                    "Emission": "0 0 0",
                    "Specular": "1 1 1",
                    "Transparent": "false",
                    "Roughness": "0.4",
                    "RefractionIndex": "1.3",
                    "ExtinctionCoef": "0.0",
                    "AbsorptionCoef": "0 0 0",
                    "ReducedScatteringCoef": "0 0 0",
                }
            ],
            "Sphere": [{"Material": "mymat", "Center": "0 0 0", "Radius": "1"}],
        },
    )
    scene = load_scene_file(path, asset_root=str(tmp_path))
    mat = scene.materials[0]
    assert mat["diffuse"] == (0.1, 0.2, 0.3)
    assert mat["roughness"] == 0.4


def test_transparent_conductor_rejected(tmp_path):
    path = _write(
        tmp_path,
        {
            "Material": [
                {"Name": "bad", "Transparent": "true", "ExtinctionCoef": "2.0"}
            ]
        },
    )
    with pytest.raises(SceneParseError):
        load_scene_file(path, asset_root=str(tmp_path))


def test_texture_id_out_of_range(tmp_path):
    path = _write(
        tmp_path,
        {"Material": [{"Name": "bad", "DiffuseTextureId": "3"}]},
    )
    with pytest.raises(SceneParseError):
        load_scene_file(path, asset_root=str(tmp_path))


def test_unknown_material_rejected(tmp_path):
    path = _write(
        tmp_path,
        {"Sphere": [{"Material": "nope", "Center": "0 0 0", "Radius": "1"}]},
    )
    with pytest.raises(SceneParseError):
        load_scene_file(path, asset_root=str(tmp_path))


@requires_reference_assets
def test_all_reference_scene_schemas_parse():
    files = list_scene_files(SCENE_DIR)
    assert len(files) == 22
    for f in files:
        scene = load_scene_file(f, asset_root=REFERENCE_ROOT, load_assets=False)
        assert scene.materials  # at least one material referenced


@requires_reference_assets
def test_cornell_box_simple_full_load():
    scene = load_scene_file(
        os.path.join(SCENE_DIR, "cornell_box_simple.json"), asset_root=REFERENCE_ROOT
    )
    assert scene.sphere_centers.shape[0] == 2
    assert len(scene.meshes) == 2  # cornell walls + light cube
    # 5 shape materials: wall_white/green/red assigned per group
    assert scene.meshes[0].material_ids.max() >= 1


def test_config_defaults_roundtrip(tmp_path):
    cfg = parse_config_dict(
        {
            "Width": "320",
            "Height": "240",
            "MaxDepth": "7",
            "BiasLength": "0.001",
            "Skybox": "false",
            "Sky": "true",
            "FOV": "60.0",
            "BvhBuildMethod": "MortonCodeCUDA",
            "AirAbsorptionCoef": "0.1 0.2 0.3",
        }
    )
    assert cfg.width == 320 and cfg.height == 240
    assert cfg.max_tracer_depth == 7
    assert cfg.fov == 60.0  # honored, unlike the reference FOV-as-bool bug
    assert cfg.bvh_build == BvhBuildMethod.LBVH
    assert cfg.air_absorption_coef == (0.1, 0.2, 0.3)
    assert not cfg.use_sky_box and cfg.use_sky


@requires_reference_assets
def test_reference_config_parses():
    cfg = load_config_file(
        os.path.join(REFERENCE_ROOT, "res", "configuration", "config.json")
    )
    assert cfg.width == 1440 and cfg.height == 900
    assert cfg.max_tracer_depth == 20
    assert cfg.use_sky_box and not cfg.use_sky
    assert cfg.fov == 45.0
