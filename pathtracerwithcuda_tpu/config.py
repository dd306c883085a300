"""Render configuration.

Parity with the reference 23-key ``config.json``
(reference: gpu_path_tracer/res/configuration/config.json:1-25, schema doc
Core/config_parser.h:38-65, POD struct Core/configuration.h:9-34).

The reference copies its config struct into CUDA managed memory so kernels can
read it and the UI can mutate it live (Core/config_parser.cpp:159-187).  On
TPU the config is a frozen Python dataclass whose fields become *static*
(compile-time) constants of the jitted render step; anything meant to be
live-editable without recompilation (materials, camera, transforms) is a traced
input instead.

Deliberate fix vs reference: the reference parses "FOV" with parse_bool
(Core/config_parser.cpp:111) and then overrides the camera FOV to 45 degrees
(Main/window.cpp:356-360).  We parse it as a float and honor it.

CUDA-only keys (BlockSize, MaxBlockSize, BvhBuildBlockSize, CUDAAcceleration,
FullScreen) are accepted by the parser for file compatibility but have no
device meaning here; BlockSize's role (work granularity) maps to `chunk_size`,
the ray-chunk length over which each while-loop traversal runs.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple


class BvhBuildMethod(enum.Enum):
    """Reference: Bvh/bvh_build_config.h (NaiveCPU / MortonCodeCPU / MortonCodeCUDA).

    The TPU build has a host SAH builder (quality, per-scene) and a jittable
    LBVH (device, for dynamic rebuild parity).  Reference names are accepted as
    aliases by the config parser.
    """

    SAH = "SAH"
    LBVH = "LBVH"


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # image
    width: int = 1440
    height: int = 900
    use_fullscreen: bool = False  # accepted for parity; headless build ignores it

    # work granularity (CUDA BlockSize analog: rays per traversal chunk)
    chunk_size: int = 8192

    # integrator
    max_tracer_depth: int = 20
    vector_bias_length: float = 0.0002  # "BiasLength": ray origin epsilon
    energy_exist_threshold: float = 0.000001  # low-energy ray kill (biased, as reference)
    sss_threshold: float = 0.000001  # |absorption| above which medium events run

    # environment / sampling toggles
    use_sky_box: bool = True
    use_sky: bool = False
    use_bilinear: bool = True
    gamma_correction: bool = True
    use_anti_alias: bool = True
    fov: float = 45.0

    # BVH build (reference default leaf=1, config.json:17; 4 amortizes the
    # packet kernel's leaf fetch better on TPU — the parser honors whatever
    # the config file says)
    bvh_leaf_node_triangle_num: int = 4
    bvh_bucket_max_divide_internal_num: int = 12
    bvh_build: BvhBuildMethod = BvhBuildMethod.SAH

    # use the Pallas packet-traversal kernel on TPU when the scene tables
    # fit VMEM (ops/traversal_pallas.py); XLA while-loop walk otherwise
    use_pallas: bool = True
    # "auto": packet kernel on TPU only; "interpret": force the packet kernel
    # in Pallas interpret mode on any backend (tests exercise the production
    # traversal + shard_map composition on the virtual CPU mesh); "off":
    # never use the packet kernel even on TPU
    pallas_mode: str = "auto"
    # which Pallas traversal kernel the host loop dispatches:
    # "wide" = 8-wide BVH row walk (ops/traversal_wide.py; ~2.4x the binary
    # kernel on coherent loads, measured v5e), "row" = binary skip-link
    # row-packet walk (ops/traversal_pallas.py)
    traversal_kernel: str = "wide"
    # compaction sort key between bounces (render/wavefront._repack_jit):
    # "octant" = 3-bit direction octant; "cell_octant" = coarse origin cell
    # (4^3 grid over the scene box) then octant — clusters ray ORIGINS first
    # so a 128-ray row shares subtrees, not just a direction sign pattern
    # (flagship 1080p spp-trace 3.35 -> 3.04 s measured, v5e)
    repack_key: str = "cell_octant"

    # unbiased Russian roulette (OFF by default for reference parity: the
    # reference only has the biased low-energy kill, SURVEY §7; this is the
    # deliberate-deviation option SURVEY licenses).  From rr_start_depth on,
    # each lane survives a bounce with probability q = clamp(max(throughput),
    # 0.05, 1) and survivors scale throughput by 1/q — expectation unchanged,
    # but long-lived low-variance lanes (SSS media!) actually terminate, so
    # the wavefront compaction ladder keeps shrinking.
    russian_roulette: bool = False
    rr_start_depth: int = 3

    # participating medium the camera starts in ("air")
    air_refraction_index: float = 1.000293
    air_absorption_coef: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    air_reduced_scattering_coef: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    # new in the TPU build ------------------------------------------------
    # samples accumulated per render_pass call (reference: 1 pass per frame)
    spp_per_pass: int = 1
    # bounce-loop composition: "while" (early-exit lax.while_loop),
    # "scan" (fixed depth, reverse-AD safe), "unroll" (python-unrolled),
    # "host" (one dispatch per bounce with host-side early exit — smallest
    # compile units, used where giant loop-wrapped programs compile poorly),
    # "auto" (host on TPU, while elsewhere — resolved by RenderSession)
    loop_mode: str = "auto"

    def resolved_loop_mode(self) -> str:
        if self.loop_mode != "auto":
            return self.loop_mode
        import jax

        return "host" if jax.default_backend() == "tpu" else "while"

    @property
    def pixel_count(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
