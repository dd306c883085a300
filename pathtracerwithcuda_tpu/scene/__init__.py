from pathtracerwithcuda_tpu.scene.build import HostMesh, HostScene, build_scene_data
from pathtracerwithcuda_tpu.scene.parser import load_scene_file, list_scene_files
from pathtracerwithcuda_tpu.scene.config_parser import load_config_file

__all__ = [
    "HostMesh",
    "HostScene",
    "build_scene_data",
    "load_scene_file",
    "list_scene_files",
    "load_config_file",
]
