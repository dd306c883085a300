from pathtracerwithcuda_tpu.core.types import (
    MaterialTable,
    RenderCamera,
    SceneData,
    TextureAtlas,
)
from pathtracerwithcuda_tpu.core.camera import ViewCamera

__all__ = [
    "MaterialTable",
    "RenderCamera",
    "SceneData",
    "TextureAtlas",
    "ViewCamera",
]
