"""config.json parser — reference key set
(gpu_path_tracer/res/configuration/config.json:1-25, doc Core/config_parser.h:38-65).

All values arrive as strings; native JSON types are accepted too.  CUDA-only
keys are consumed without effect (BlockSize maps to chunk_size).  Unlike the
reference (which parses FOV with parse_bool, Core/config_parser.cpp:111, and
then hardcodes 45°), FOV is honored as a float.
"""

from __future__ import annotations

import json

from pathtracerwithcuda_tpu.config import BvhBuildMethod, RenderConfig

_BVH_ALIASES = {
    "NaiveCPU": BvhBuildMethod.SAH,
    "MortonCodeCPU": BvhBuildMethod.LBVH,
    "MortonCodeCUDA": BvhBuildMethod.LBVH,
    "SAH": BvhBuildMethod.SAH,
    "LBVH": BvhBuildMethod.LBVH,
}


def _f(v):
    return float(str(v).strip())


def _i(v):
    return int(str(v).strip())


def _b(v):
    return v if isinstance(v, bool) else str(v).strip().lower() == "true"


def _f3(v):
    parts = [float(x) for x in str(v).split()] if isinstance(v, str) else [float(x) for x in v]
    return tuple(parts)


def parse_config_dict(doc: dict) -> RenderConfig:
    kw = {}
    mapping = {
        "Width": ("width", _i),
        "Height": ("height", _i),
        "FullScreen": ("use_fullscreen", _b),
        "BlockSize": ("chunk_size", lambda v: _i(v)),
        "MaxDepth": ("max_tracer_depth", _i),
        "BiasLength": ("vector_bias_length", _f),
        "EnergyThreshold": ("energy_exist_threshold", _f),
        "SSSThreshold": ("sss_threshold", _f),
        "Skybox": ("use_sky_box", _b),
        "Sky": ("use_sky", _b),
        "BilinearSample": ("use_bilinear", _b),
        "GammaCorrection": ("gamma_correction", _b),
        "AntiAlias": ("use_anti_alias", _b),
        "FOV": ("fov", _f),
        "BvhLeafNodeTriangleNum": ("bvh_leaf_node_triangle_num", _i),
        "BvhBucketMaxDivideInternalNum": ("bvh_bucket_max_divide_internal_num", _i),
        "BvhBuildMethod": ("bvh_build", lambda v: _BVH_ALIASES[str(v).strip()]),
        "AirRefractionIndex": ("air_refraction_index", _f),
        "AirAbsorptionCoef": ("air_absorption_coef", _f3),
        "AirReducedScatteringCoef": ("air_reduced_scattering_coef", _f3),
    }
    for key, (field, conv) in mapping.items():
        if key in doc:
            kw[field] = conv(doc[key])
    # CUDA-only knobs accepted and dropped: MaxBlockSize, BvhBuildBlockSize,
    # CUDAAcceleration
    cfg = RenderConfig(**kw)
    # the reference BlockSize (64) is far too small a chunk for a TPU vector
    # unit; interpret tiny values as "use the default chunk"
    if cfg.chunk_size < 1024:
        cfg = cfg.replace(chunk_size=8192)
    return cfg


def load_config_file(path: str) -> RenderConfig:
    with open(path, "r") as f:
        return parse_config_dict(json.load(f))
